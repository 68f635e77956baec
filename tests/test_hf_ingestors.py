"""HF-backed ingestors driven with locally constructed datasets (offline)."""

import numpy as np
import pytest

from autorag_research_tpu.store.catalog import Catalog
from autorag_research_tpu.store.ingestion import IngestionService


def ds(rows):
    import datasets

    if not rows:
        return datasets.Dataset.from_dict({})
    keys = rows[0].keys()
    return datasets.Dataset.from_dict({k: [r.get(k) for r in rows] for k in keys})


@pytest.fixture
def service(tmp_path):
    cat = Catalog(tmp_path / "hf.db")
    return cat, IngestionService(cat)


def test_text_mteb(service):
    from autorag_research_tpu.data.text_mteb import TextMTEBIngestor

    cat, svc = service
    data = {
        "corpus": ds([{"_id": "d1", "title": "T", "text": "alpha"},
                      {"_id": "d2", "title": "", "text": "beta"}]),
        "queries": ds([{"_id": "q1", "text": "find alpha"}]),
        "qrels": ds([{"query-id": "q1", "corpus-id": "d1", "score": 2},
                     {"query-id": "q1", "corpus-id": "d2", "score": 0}]),
    }
    ing = TextMTEBIngestor(data=data)
    ing.set_service(svc)
    ing.ingest()
    assert cat.count("chunk") == 2
    rels = cat.get_relations_by_query("q1")
    assert [r["chunk_id"] for r in rels] == ["d1"]  # score-0 excluded
    assert cat.get_chunk_contents(["d1"])["d1"] == "T alpha"


def test_ragbench(service):
    from autorag_research_tpu.data.ragbench import RAGBenchIngestor

    cat, svc = service
    data = ds([
        {"id": "r1", "question": "what is x", "documents": ["doc about x", "doc about y"],
         "response": "x is x"},
        {"id": "r2", "question": "what is y", "documents": ["doc about y"], "response": "y"},
    ])
    ing = RAGBenchIngestor(data=data)
    ing.set_service(svc)
    ing.ingest()
    assert cat.count("query") == 2
    assert cat.count("chunk") == 2  # shared doc deduplicated by hash
    row = cat.get_query("r1")
    import json

    assert json.loads(row["generation_gt"]) == ["x is x"]


def test_mrtydi(service):
    from autorag_research_tpu.data.mrtydi import MrTyDiIngestor

    cat, svc = service
    data = ds([
        {"query_id": "m1", "query": "question one",
         "positive_passages": [{"docid": "p1", "title": "t", "text": "pos"}],
         "negative_passages": [{"docid": "n1", "title": "", "text": "neg"}]},
    ])
    ing = MrTyDiIngestor(data=data)
    ing.set_service(svc)
    ing.ingest()
    assert cat.count("chunk") == 2
    rels = cat.get_relations_by_query("m1")
    assert [r["chunk_id"] for r in rels] == ["p1"]


def test_bright(service):
    from autorag_research_tpu.data.bright import BRIGHTIngestor

    cat, svc = service
    data = {
        "examples": ds([{"id": "b1", "query": "why", "gold_ids": ["g1"], "gold_answer": "because"}]),
        "documents": ds([{"id": "g1", "content": "gold doc"}, {"id": "g2", "content": "other"}]),
    }
    ing = BRIGHTIngestor(data=data)
    ing.set_service(svc)
    ing.ingest(min_corpus_cnt=2)
    assert cat.count("chunk") == 2
    assert cat.get_relations_by_query("b1")[0]["chunk_id"] == "g1"


def test_crag(service):
    from autorag_research_tpu.data.crag import CRAGIngestor

    cat, svc = service
    data = ds([
        {"interaction_id": "c1", "query": "who", "answer": "them",
         "search_results": [{"page_snippet": "snippet one"}, {"page_snippet": ""}],
         "domain": "sports", "question_type": "simple"},
    ])
    ing = CRAGIngestor(data=data)
    ing.set_service(svc)
    ing.ingest()
    assert cat.count("chunk") == 1
    assert cat.count_relations_by_query("c1") == 1


def _png(color):
    from PIL import Image

    return Image.new("RGB", (4, 4), color)


def test_vidore_v1(service):
    from autorag_research_tpu.data.vidore import ViDoReIngestor

    cat, svc = service
    data = ds([
        {"query": "find the chart", "image": None, "image_filename": "pg1"},
    ])
    # datasets can't hold PIL images in from_dict easily; emulate rows directly
    rows = [{"query": "find the chart", "image": _png("red"), "image_filename": "pg1"}]
    ing = ViDoReIngestor(data=rows)
    ing.set_service(svc)
    ing.ingest()
    assert cat.count("image_chunk") == 1
    qid = cat.get_all_query_ids()[0]
    rels = cat.get_relations_by_query(qid)
    assert rels[0]["image_chunk_id"] == "pg1"
    img = cat.get_image_chunks(["pg1"])["pg1"]
    assert img["image"].startswith(b"\x89PNG")


def test_vidore_v2_split_shape(service):
    from autorag_research_tpu.data.vidore import ViDoReV2Ingestor

    cat, svc = service
    data = {
        "corpus": [{"corpus-id": "p1", "image": _png("blue")},
                   {"corpus-id": "p2", "image": _png("green")}],
        "queries": [{"query-id": "v1", "query": "where is the table"}],
        "qrels": [{"query-id": "v1", "corpus-id": "p2", "score": 1}],
    }
    ing = ViDoReV2Ingestor(data=data)
    ing.set_service(svc)
    ing.ingest()
    assert cat.count("image_chunk") == 2
    assert cat.get_relations_by_query("v1")[0]["image_chunk_id"] == "p2"


def _vidorev3_data():
    # two docs: doc A pages 1-2 (both with markdown), doc B page 1 (image-only)
    return {
        "corpus": [
            {"corpus_id": "c1", "image": _png("red"), "doc_id": "dA",
             "page_number_in_doc": 1, "markdown": "# alpha table"},
            {"corpus_id": "c2", "image": _png("blue"), "doc_id": "dA",
             "page_number_in_doc": 2, "markdown": "beta figures"},
            {"corpus_id": "c3", "image": _png("green"), "doc_id": "dB",
             "page_number_in_doc": 1, "markdown": ""},
        ],
        "queries": [
            {"query_id": "q1", "query": "where is alpha", "answer": "page one",
             "query_types": ["extractive"]},
            {"query_id": "q2", "query": "compare alpha and beta",
             "query_types": ["multi-hop"]},
        ],
        "qrels": [
            {"query_id": "q1", "corpus_id": "c1", "score": 2},
            {"query_id": "q1", "corpus_id": "c3", "score": 1},
            {"query_id": "q1", "corpus_id": "c2", "score": 0},  # dropped
            {"query_id": "q2", "corpus_id": "c1", "score": 1},
            {"query_id": "q2", "corpus_id": "c2", "score": 1},
        ],
        "documents_metadata": [
            {"doc_id": "dA", "url": "http://x/a.pdf", "file_name": "a.pdf",
             "doc_type": "report", "doc_language": "en", "doc_year": 2024},
            {"doc_id": "dB", "url": "http://x/b.pdf", "file_name": "b.pdf"},
        ],
    }


class TestViDoReV3Modes:
    def _ingest(self, svc, qrels_mode):
        from autorag_research_tpu.data.vidore import ViDoReV3Ingestor

        ing = ViDoReV3Ingestor(data=_vidorev3_data(), qrels_mode=qrels_mode)
        ing.set_service(svc)
        ing.ingest()
        return ing

    def test_image_mode_graded_scores(self, service):
        cat, svc = service
        self._ingest(svc, "image")
        rels = cat.get_relations_by_query("q1")
        # score=0 row dropped; grades carried, not flattened to binary
        by_id = {r["image_chunk_id"]: r["score"] for r in rels}
        assert by_id == {"c1": 2, "c3": 1}
        # all OR-alternatives in one group (not multi-hop)
        assert {r["group_index"] for r in rels} == {0}
        # markdown pages became text chunks alongside image chunks
        assert cat.count("image_chunk") == 3
        assert cat.count("chunk") == 2
        # q1 carries generation GT from the answer column
        import json

        assert json.loads(cat.get_query("q1")["generation_gt"]) == ["page one"]

    def test_multi_hop_uses_and_groups(self, service):
        cat, svc = service
        self._ingest(svc, "image")
        rels = cat.get_relations_by_query("q2")
        # multi-hop: each page its own AND group
        assert {r["group_index"] for r in rels} == {0, 1}

    def test_text_mode_only_pages_with_markdown(self, service):
        cat, svc = service
        self._ingest(svc, "text")
        rels = cat.get_relations_by_query("q1")
        # c3 has no markdown -> no text chunk -> excluded
        assert [(r["chunk_id"], r["score"]) for r in rels] == [("c1", 2)]
        assert all(r["image_chunk_id"] is None for r in rels)

    def test_mixed_mode_pairs_text_and_image(self, service):
        cat, svc = service
        self._ingest(svc, "mixed")
        rels = cat.get_relations_by_query("q1")
        # c1: image+text alternatives; c3: image only — one flat OR group
        got = {(r["chunk_id"], r["image_chunk_id"], r["score"]) for r in rels}
        assert got == {(None, "c1", 2), ("c1", None, 2), (None, "c3", 1)}
        assert {r["group_index"] for r in rels} == {0}
        # multi-hop mixed: (text|image) AND (text|image)
        rels2 = cat.get_relations_by_query("q2")
        groups = {}
        for r in rels2:
            groups.setdefault(r["group_index"], set()).add(
                (r["chunk_id"], r["image_chunk_id"])
            )
        assert len(groups) == 2
        assert all(len(g) == 2 for g in groups.values())

    def test_document_hierarchy(self, service):
        cat, svc = service
        self._ingest(svc, "image")
        assert cat.count("file") == 2
        assert cat.count("document") == 2
        assert cat.count("page") == 3
        # image chunks link to their page rows
        chunks = cat.get_image_chunks(["c1", "c2", "c3"])
        assert chunks["c1"]["page_id"] == "dA_p1"
        assert chunks["c2"]["page_id"] == "dA_p2"
        assert chunks["c3"]["page_id"] == "dB_p1"

    def test_image_only_collection_rejects_text_mode(self):
        from autorag_research_tpu.data.vidore import ViDoReV2Ingestor

        with pytest.raises(ValueError, match="image-only"):
            ViDoReV2Ingestor(data={}, qrels_mode="mixed")
        with pytest.raises(ValueError, match="qrels_mode"):
            ViDoReV2Ingestor(data={}, qrels_mode="both")

    def test_graded_scores_flow_to_evaluation_gt(self, service):
        cat, svc = service
        self._ingest(svc, "image")
        from autorag_research_tpu.store.gt import build_retrieval_gt_from_relations

        gt, scores = build_retrieval_gt_from_relations(
            [dict(r) for r in cat.get_relations_by_query("q1")]
        )
        assert gt == [["image_chunk_c1", "image_chunk_c3"]]
        assert scores == {"image_chunk_c1": 2, "image_chunk_c3": 1}


def test_kovidore_and_sds_kopub_text_modes(service):
    # same compression audit: the Korean collections expose text/mixed too
    from autorag_research_tpu.data.visrag import KoViDoReV2Ingestor, SDSKoPubVDRIngestor

    cat, svc = service
    data = {
        "corpus": [
            {"corpus_id": "k1", "image": _png("red"), "markdown": "alpha"},
            {"corpus_id": "k2", "image": _png("blue"), "markdown": ""},
        ],
        "queries": [{"query_id": "kq", "query": "alpha?", "query_types": ["multi-hop"]}],
        "qrels": [
            {"query_id": "kq", "corpus_id": "k1", "score": 2},
            {"query_id": "kq", "corpus_id": "k2", "score": 1},
        ],
    }
    ing = KoViDoReV2Ingestor(data=data, qrels_mode="mixed")
    ing.set_service(svc)
    ing.ingest()
    rels = cat.get_relations_by_query("kq")
    # multi-hop honored: two AND groups; k1 has text+image, k2 image-only
    groups = {}
    for r in rels:
        groups.setdefault(r["group_index"], []).append(r)
    assert len(groups) == 2
    sizes = sorted(len(g) for g in groups.values())
    assert sizes == [1, 2]

    # SDS KoPub reads the "text" column and never ANDs (no multi-hop support)
    sds = SDSKoPubVDRIngestor(
        data={
            "corpus": [{"corpus_id": "s1", "image": _png("green"), "text": "beta"}],
            "queries": [{"query_id": "sq", "query": "beta?", "query_types": ["multi-hop"]}],
            "qrels": [{"query_id": "sq", "corpus_id": "s1", "score": 1}],
        },
        qrels_mode="text",
    )
    sds.set_service(svc)
    sds.ingest()
    rels = cat.get_relations_by_query("sq")
    assert [(r["chunk_id"], r["score"]) for r in rels] == [("s1", 1)]


def test_visrag_with_generation_gt(service):
    from autorag_research_tpu.data.visrag import VisRAGIngestor

    cat, svc = service
    data = {
        "corpus": [{"corpus-id": "pg1", "image": _png("white")}],
        "queries": [{"query-id": "q1", "query": "what is shown", "answer": "a page"}],
        "qrels": [{"query-id": "q1", "corpus-id": "pg1", "score": 1}],
    }
    ing = VisRAGIngestor(data=data)
    ing.set_service(svc)
    ing.ingest()
    import json

    assert json.loads(cat.get_query("q1")["generation_gt"]) == ["a page"]


def test_open_ragbench(service):
    from autorag_research_tpu.data.open_ragbench import OpenRAGBenchIngestor

    cat, svc = service
    rows = [{"id": "o1", "question": "what", "contexts": ["ctx one"], "answer": "ans",
             "page_image": _png("black")}]
    ing = OpenRAGBenchIngestor(data=rows)
    ing.set_service(svc)
    ing.ingest()
    assert cat.count("chunk") == 1
    assert cat.count("image_chunk") == 1
    # mixed-mode GT like the reference: the source chunk OR the page image
    rels = cat.get_relations_by_query("o1")
    chunk_gt = [r["chunk_id"] for r in rels if r["chunk_id"] is not None]
    image_gt = [r["image_chunk_id"] for r in rels if r["image_chunk_id"] is not None]
    assert len(chunk_gt) == 1 and image_gt == ["o1_page"]
    # all in ONE OR group
    assert len({r["group_index"] for r in rels}) == 1


def test_visrag_min_corpus_cnt_preserves_gold(service):
    """min_corpus_cnt subsamples the page corpus while ALWAYS keeping the
    selected queries' gold pages (reference _filter_corpus semantics)."""
    from autorag_research_tpu.data.visrag import VisRAGIngestor

    cat, svc = service
    corpus = [{"corpus-id": f"pg{i}", "image": _png("white")} for i in range(20)]
    data = {
        "corpus": corpus,
        "queries": [
            {"query-id": "q1", "query": "find page 17", "answer": "yes"},
            {"query-id": "q_textless"},  # no query/text -> must be skipped
        ],
        "qrels": [
            {"query-id": "q1", "corpus-id": "pg17", "score": 1},
            {"query-id": "q_textless", "corpus-id": "pg3", "score": 1},
        ],
    }
    ing = VisRAGIngestor(data=data)
    ing.set_service(svc)
    ing.ingest(min_corpus_cnt=5)
    assert cat.count("image_chunk") == 5
    assert "pg17" in cat.get_image_chunks(["pg17"])  # gold page survived
    assert cat.count("query") == 1  # text-less query row filtered out


def test_offline_load_raises_cleanly():
    from autorag_research_tpu.data.text_mteb import TextMTEBIngestor
    from autorag_research_tpu.exceptions import IngestionError

    ing = TextMTEBIngestor(task_name="NoSuchTask")
    ing.set_service(None)  # type: ignore[arg-type]
    with pytest.raises(IngestionError):
        ing._load("test")


def test_all_reference_ingestors_registered():
    from autorag_research_tpu.data.registry import list_ingestors

    names = {i.name for i in list_ingestors()}
    assert {
        "beir", "local", "text_mteb", "ragbench", "mrtydi", "bright", "crag",
        "vidore", "vidorev2", "vidorev3", "visrag", "sds_kopub_vdr",
        "kovidorev2", "open_ragbench",
    } <= names
