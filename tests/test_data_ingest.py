"""Ingestors over synthetic BEIR-format fixtures + embedding driver."""

import json

import numpy as np
import pytest

from autorag_research_tpu.data.registry import get_ingestor, list_ingestors
from autorag_research_tpu.embeddings import MockEmbedding, MockMultiVectorEmbedding
from autorag_research_tpu.store.catalog import Catalog
from autorag_research_tpu.store.ingestion import IngestionService


@pytest.fixture
def beir_dir(tmp_path):
    d = tmp_path / "beir_fixture"
    (d / "qrels").mkdir(parents=True)
    docs = [
        {"_id": f"doc{i}", "title": f"Title {i}", "text": f"body text {i} topic {i % 3}"}
        for i in range(20)
    ]
    (d / "corpus.jsonl").write_text("\n".join(json.dumps(x) for x in docs))
    queries = [{"_id": f"q{i}", "text": f"question about topic {i}"} for i in range(6)]
    (d / "queries.jsonl").write_text("\n".join(json.dumps(x) for x in queries))
    lines = ["query-id\tcorpus-id\tscore"]
    for i in range(5):  # q5 has no qrels -> excluded
        lines.append(f"q{i}\tdoc{i}\t1")
        lines.append(f"q{i}\tdoc{i + 10}\t2")
        lines.append(f"q{i}\tdoc{i + 5}\t0")  # zero score -> not GT
    (d / "qrels" / "test.tsv").write_text("\n".join(lines))
    return d


class TestBEIR:
    def make(self, beir_dir, **kw):
        info = get_ingestor("beir")
        return info.cls(dataset_name="scifact", data_dir=str(beir_dir), **kw)

    def test_full_ingest(self, beir_dir, tmp_path):
        cat = Catalog(tmp_path / "b.db")
        service = IngestionService(cat)
        ing = self.make(beir_dir)
        ing.set_service(service)
        ing.ingest()
        assert cat.count("chunk") == 20
        assert cat.count("query") == 5  # q5 has no qrels
        rels = cat.get_relations_by_query("q0")
        # or_all -> single group, zero-score doc excluded
        assert {r["chunk_id"] for r in rels} == {"doc0", "doc10"}
        assert all(r["group_index"] == 0 for r in rels)
        # title + text joined
        assert cat.get_chunk_contents(["doc3"])["doc3"] == "Title 3 body text 3 topic 0"

    def test_gold_preserving_subsample(self, beir_dir, tmp_path):
        cat = Catalog(tmp_path / "b2.db")
        ing = self.make(beir_dir)
        ing.set_service(IngestionService(cat))
        ing.ingest(query_limit=3, min_corpus_cnt=8)
        assert cat.count("query") <= 3
        assert cat.count("chunk") >= 8 - 2  # golds + fill
        # every GT doc must exist in the corpus (gold preservation)
        for qid in cat.get_all_query_ids():
            for r in cat.get_relations_by_query(qid):
                assert cat.get_chunk_contents([r["chunk_id"]])

    def test_hotpotqa_uses_and_groups(self, beir_dir, tmp_path):
        cat = Catalog(tmp_path / "b3.db")
        info = get_ingestor("beir")
        ing = info.cls(dataset_name="hotpotqa", data_dir=str(beir_dir))
        ing.set_service(IngestionService(cat))
        ing.ingest()
        rels = cat.get_relations_by_query("q1")
        assert {r["group_index"] for r in rels} == {0, 1}  # and_all -> 2 groups

    def test_missing_dir_raises(self, tmp_path):
        from autorag_research_tpu.exceptions import IngestionError

        info = get_ingestor("beir")
        with pytest.raises(IngestionError):
            info.cls(dataset_name="scifact", data_dir=str(tmp_path / "nope"))

    def test_embed_all(self, beir_dir, tmp_path):
        cat = Catalog(tmp_path / "b4.db")
        ing = self.make(beir_dir, embedding_model=MockEmbedding(dim=16))
        ing.set_service(IngestionService(cat))
        ing.ingest()
        stats = ing.embed_all(batch_size=7)
        assert stats["chunk"].embedded == 20
        assert stats["query"].embedded == 5
        assert cat.embedding_dim == 16
        assert cat.count_unembedded("chunk") == 0
        # resume: second call is a no-op
        stats2 = ing.embed_all()
        assert stats2["chunk"].embedded == 0

    def test_embed_late_interaction(self, beir_dir, tmp_path):
        cat = Catalog(tmp_path / "b5.db")
        ing = self.make(beir_dir, embedding_model=MockMultiVectorEmbedding(dim=16))
        ing.set_service(IngestionService(cat))
        ing.ingest(query_limit=2)
        stats = ing.embed_all_late_interaction(batch_size=4)
        assert stats["chunk"].embedded == 20
        ids, mats = cat.get_embeddings_matrix("chunk", multi=True)
        assert len(ids) == 20 and mats[0].shape[1] == 16


class TestEmbedQuarantine:
    def test_failing_rows_are_quarantined(self, tmp_path):
        class FlakyEmbedding(MockEmbedding):
            def embed_texts(self, texts):
                if any("poison" in t for t in texts):
                    raise RuntimeError("bad input")
                return super().embed_texts(texts)

        cat = Catalog(tmp_path / "q.db")
        cat.add_chunks(
            [{"id": 1, "contents": "fine"}, {"id": 2, "contents": "poison pill"},
             {"id": 3, "contents": "also fine"}]
        )
        service = IngestionService(cat)
        stats = service.embed_table(FlakyEmbedding(dim=8), "chunk", batch_size=10)
        assert stats.embedded == 2
        assert stats.failed_ids == [2]
        assert cat.count_unembedded("chunk") == 1


class TestPipelinedEmbedLoop:
    """Double-buffered device-embedder path (_embed_table_pipelined):
    overlaps readback+write of batch i with the dispatch of batch i+1."""

    class DeviceEmbedding(MockEmbedding):
        """Mock with the device hot path: embed_texts_device returns the
        same vectors as embed_texts (as a jnp array), like JaxEncoder."""

        def __init__(self, dim=8):
            super().__init__(dim=dim)
            self.device_calls = 0

        def embed_texts_device(self, texts):
            import jax.numpy as jnp

            self.device_calls += 1
            return jnp.asarray(np.asarray(self.embed_texts(texts)))

    def test_pipelined_equals_sync(self, tmp_path):
        rows = [{"id": i, "contents": f"text number {i}"} for i in range(23)]
        cat_p = Catalog(tmp_path / "p.db")
        cat_p.add_chunks(rows)
        emb = self.DeviceEmbedding(dim=8)
        stats = IngestionService(cat_p).embed_table(emb, "chunk", batch_size=5)
        assert stats.embedded == 23 and not stats.failed_ids
        assert emb.device_calls == 5  # the pipelined path actually ran
        assert cat_p.count_unembedded("chunk") == 0

        cat_s = Catalog(tmp_path / "s.db")
        cat_s.add_chunks(rows)
        sync_emb = MockEmbedding(dim=8)
        IngestionService(cat_s).embed_table(sync_emb, "chunk", batch_size=5)
        ids_p, mat_p = cat_p.get_embeddings_matrix("chunk")
        ids_s, mat_s = cat_s.get_embeddings_matrix("chunk")
        assert ids_p == ids_s
        np.testing.assert_allclose(mat_p, mat_s, rtol=1e-6)

    def test_pipelined_dispatch_failure_quarantines_per_item(self, tmp_path):
        class Flaky(self.DeviceEmbedding):
            def embed_texts_device(self, texts):
                if any("poison" in t for t in texts):
                    raise RuntimeError("bad batch")
                return super().embed_texts_device(texts)

            def embed_texts(self, texts):
                if any("poison" in t for t in texts):
                    raise RuntimeError("bad item")
                return super().embed_texts(texts)

        cat = Catalog(tmp_path / "f.db")
        cat.add_chunks(
            [{"id": 1, "contents": "fine"}, {"id": 2, "contents": "poison pill"},
             {"id": 3, "contents": "also fine"}]
        )
        stats = IngestionService(cat).embed_table(Flaky(dim=8), "chunk", batch_size=10)
        assert stats.embedded == 2
        assert stats.failed_ids == [2]
        assert cat.count_unembedded("chunk") == 1

    def test_pipelined_resume_skips_existing(self, tmp_path):
        cat = Catalog(tmp_path / "r.db")
        cat.add_chunks([{"id": i, "contents": f"t{i}"} for i in range(9)])
        emb = self.DeviceEmbedding(dim=8)
        IngestionService(cat).embed_table(emb, "chunk", batch_size=4, max_batches=1)
        assert cat.count_unembedded("chunk") == 5
        stats = IngestionService(cat).embed_table(emb, "chunk", batch_size=4)
        assert stats.embedded == 5  # only the remaining rows
        assert cat.count_unembedded("chunk") == 0


class TestLocalIngestor:
    def test_local_jsonl(self, tmp_path):
        d = tmp_path / "local"
        d.mkdir()
        (d / "corpus.jsonl").write_text(
            "\n".join(json.dumps({"id": i, "contents": f"doc {i}"}) for i in range(4))
        )
        (d / "queries.jsonl").write_text(
            json.dumps({"id": 100, "contents": "q", "gt": [[0, 1], [2]], "generation_gt": ["ans"]})
        )
        cat = Catalog(tmp_path / "l.db")
        info = get_ingestor("local")
        ing = info.cls(data_dir=str(d))
        ing.set_service(IngestionService(cat))
        ing.ingest()
        assert cat.count("chunk") == 4
        from autorag_research_tpu.store.gt import build_retrieval_gt_from_relations

        gt, _ = build_retrieval_gt_from_relations(
            [dict(r) for r in cat.get_relations_by_query(100)]
        )
        assert gt == [["chunk_0", "chunk_1"], ["chunk_2"]]


def test_registry_params_and_listing():
    infos = {i.name for i in list_ingestors()}
    assert {"beir", "local"} <= infos
    beir = get_ingestor("beir")
    pnames = {p.name for p in beir.params}
    assert {"dataset_name", "data_dir"} <= pnames
