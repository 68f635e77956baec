"""Model-backed generation scorers (BERTScore, BARTScore, UniEval, AlignScore,
MiniCheck).

Capability parity with the reference's HF-model metrics
(``evaluation/metrics/generation.py:885-1003`` BARTScore forced-decode scorer,
``:1179-1220`` BERTScore, ``unieval.py:18-116`` T5 yes/no scorer,
``:1443-1523`` AlignScore with context windowing, ``:1525+`` MiniCheck).

This image has no network egress, so these scorers require a *local* HF
checkpoint directory (``checkpoint=...``). The implementations below run the
models through ``transformers`` on CPU/JAX-adjacent torch; when no checkpoint
is resolvable they raise ``ModelLoadError`` with guidance instead of failing
obscurely. The full scoring math executes in ``tests/test_model_scorers.py``
against tiny random-init checkpoints built offline (``tests/tiny_models.py``).
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

from autorag_research_tpu.exceptions import ModelLoadError
from autorag_research_tpu.schema import MetricInput

DEFAULT_BARTSCORE_CHECKPOINT = "facebook/bart-large-cnn"
DEFAULT_UNIEVAL_CHECKPOINT = "MingZhong/unieval-sum"
DEFAULT_ALIGNSCORE_CHECKPOINT = "krotima1/AlignScore-base"
DEFAULT_MINICHECK_CHECKPOINT = "lytang/MiniCheck-Flan-T5-Large"
DEFAULT_BERTSCORE_CHECKPOINT = "roberta-large"


@functools.lru_cache(maxsize=4)
def _load_seq2seq(checkpoint: str):
    try:
        import torch  # noqa: F401
        from transformers import AutoModelForSeq2SeqLM, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(checkpoint, local_files_only=True)
        model = AutoModelForSeq2SeqLM.from_pretrained(checkpoint, local_files_only=True)
        model.eval()
        return tok, model
    except Exception as exc:  # noqa: BLE001
        raise ModelLoadError(
            f"cannot load local seq2seq checkpoint '{checkpoint}' "
            "(zero-egress image: pass checkpoint=<local path> to this metric)"
        ) from exc


@functools.lru_cache(maxsize=4)
def _load_encoder(checkpoint: str):
    try:
        import torch  # noqa: F401
        from transformers import AutoModel, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(checkpoint, local_files_only=True)
        model = AutoModel.from_pretrained(checkpoint, local_files_only=True)
        model.eval()
        return tok, model
    except Exception as exc:  # noqa: BLE001
        raise ModelLoadError(
            f"cannot load local encoder checkpoint '{checkpoint}' "
            "(zero-egress image: pass checkpoint=<local path> to this metric)"
        ) from exc


def _forced_decode_logprob(tok, model, sources: list[str], targets: list[str],
                           max_length: int, batch_size: int) -> list[float]:
    """Mean per-token log-likelihood of target given source (BARTScore core,
    reference ``generation.py:885-1003``)."""
    import torch

    scores: list[float] = []
    loss_fct = torch.nn.NLLLoss(reduction="none", ignore_index=model.config.pad_token_id)
    lsm = torch.nn.LogSoftmax(dim=1)
    with torch.no_grad():
        for i in range(0, len(sources), batch_size):
            src = sources[i : i + batch_size]
            tgt = targets[i : i + batch_size]
            enc_src = tok(src, truncation=True, padding=True, max_length=max_length, return_tensors="pt")
            enc_tgt = tok(tgt, truncation=True, padding=True, max_length=max_length, return_tensors="pt")
            tgt_ids = enc_tgt["input_ids"]
            tgt_mask = enc_tgt["attention_mask"].float()
            output = model(
                input_ids=enc_src["input_ids"],
                attention_mask=enc_src["attention_mask"],
                labels=tgt_ids,
            )
            logits = output.logits.view(-1, model.config.vocab_size)
            loss = loss_fct(lsm(logits), tgt_ids.view(-1))
            loss = loss.view(tgt_ids.shape[0], -1) * tgt_mask
            scores.extend((-loss.sum(dim=1) / tgt_mask.sum(dim=1)).tolist())
    return scores


def bart_score_batch(
    metric_inputs: list[MetricInput],
    direction: str = "faithfulness",
    checkpoint: str = DEFAULT_BARTSCORE_CHECKPOINT,
    batch_size: int = 4,
    max_length: int = 1024,
    **_: Any,
) -> list[float]:
    """direction: faithfulness = p(answer|context); precision = p(answer|gt);
    recall = p(gt|answer); f1 = harmonic-style mean of both directions."""
    tok, model = _load_seq2seq(checkpoint)

    def score(srcs, tgts):
        return _forced_decode_logprob(tok, model, srcs, tgts, max_length, batch_size)

    if direction == "faithfulness":
        # reference _join_retrieved_contents: double-newline join of STRIPPED
        # passages is the conditioning context
        srcs = [
            "\n\n".join(c.strip() for c in (mi.retrieved_contents or []))
            for mi in metric_inputs
        ]
        tgts = [mi.generated_texts or "" for mi in metric_inputs]
        return score(srcs, tgts)

    preds = [mi.generated_texts or "" for mi in metric_inputs]
    # best reference per input
    out = []
    for mi, pred in zip(metric_inputs, preds):
        refs = list(mi.generation_gt or [""])
        if direction == "precision":
            vals = score(refs, [pred] * len(refs))
        elif direction == "recall":
            vals = score([pred] * len(refs), refs)
        elif direction == "f1":
            # reference bart_score_f1: (max-over-refs precision +
            # max-over-refs recall) / 2 — NOT max over per-ref means, which
            # is strictly smaller whenever the best directions come from
            # different references
            p = score(refs, [pred] * len(refs))
            r = score([pred] * len(refs), refs)
            vals = [(max(p) + max(r)) / 2]
        else:
            raise ValueError(f"unknown bart_score direction: {direction}")
        out.append(max(vals))
    return out


def bert_score_batch(
    metric_inputs: list[MetricInput],
    checkpoint: str = DEFAULT_BERTSCORE_CHECKPOINT,
    batch: int = 32,
    layer: int = -2,
    **_: Any,
) -> list[float]:
    """Greedy token-similarity F1 between prediction and best reference using
    contextual embeddings (BERTScore, reference ``generation.py:1179-1220``)."""
    import torch

    tok, model = _load_encoder(checkpoint)

    def embed(texts: list[str]):
        with torch.no_grad():
            enc = tok(texts, truncation=True, padding=True, max_length=512, return_tensors="pt")
            hidden = model(**enc, output_hidden_states=True).hidden_states[layer]
            mask = enc["attention_mask"].bool()
        return hidden, mask

    out = []
    for mi in metric_inputs:
        pred = mi.generated_texts or ""
        refs = list(mi.generation_gt or [""])
        ph, pm = embed([pred])
        best = 0.0
        for ref in refs:
            rh, rm = embed([ref])
            p = torch.nn.functional.normalize(ph[0][pm[0]], dim=-1)
            r = torch.nn.functional.normalize(rh[0][rm[0]], dim=-1)
            sim = p @ r.T
            if sim.numel() == 0:
                continue
            precision = sim.max(dim=1).values.mean().item()
            recall = sim.max(dim=0).values.mean().item()
            f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
            best = max(best, f1)
        out.append(best)
    return out


_UNIEVAL_DIMENSION_PROMPTS = {
    "coherence": "question: Is this a coherent response? </s> response: {answer}",
    "consistency": (
        "question: Is this claim consistent with the document? </s> claim: {answer} "
        "</s> document: {context}"
    ),
    "fluency": "question: Is this a fluent response? </s> response: {answer}",
    "relevance": (
        "question: Is this response relevant to the reference? </s> response: {answer} "
        "</s> reference: {reference}"
    ),
}


def unieval_batch(
    metric_inputs: list[MetricInput],
    dimensions: tuple[str, ...] = ("coherence", "consistency", "fluency", "relevance"),
    checkpoint: str = DEFAULT_UNIEVAL_CHECKPOINT,
    **_: Any,
) -> list[float]:
    """UniEval T5 yes/no probability scorer averaged over dimensions
    (reference ``unieval.py:18-116``)."""
    import torch

    tok, model = _load_seq2seq(checkpoint)
    yes_id = tok("Yes", add_special_tokens=False)["input_ids"][0]
    no_id = tok("No", add_special_tokens=False)["input_ids"][0]

    def yes_prob(prompts: list[str]) -> list[float]:
        with torch.no_grad():
            enc = tok(prompts, truncation=True, padding=True, max_length=1024, return_tensors="pt")
            start = torch.full((len(prompts), 1), model.config.decoder_start_token_id)
            logits = model(**enc, decoder_input_ids=start).logits[:, 0, :]
            pair = torch.stack([logits[:, yes_id], logits[:, no_id]], dim=1)
            probs = torch.softmax(pair, dim=1)[:, 0]
        return probs.tolist()

    out = []
    for mi in metric_inputs:
        answer = mi.generated_texts or ""
        context = "\n".join(mi.retrieved_contents or [])
        reference = (mi.generation_gt or [""])[0]
        prompts = [
            _UNIEVAL_DIMENSION_PROMPTS[d].format(answer=answer, context=context, reference=reference)
            for d in dimensions
        ]
        out.append(float(np.mean(yes_prob(prompts))))
    return out


def align_score_batch(
    metric_inputs: list[MetricInput],
    checkpoint: str = DEFAULT_ALIGNSCORE_CHECKPOINT,
    window_tokens: int = 350,
    **_: Any,
) -> list[float]:
    """Context-windowed factual-alignment probability: the context is split
    into token windows; score = max over windows (reference windowing at
    ``generation.py:401-493``). Uses a sequence-classification checkpoint."""
    try:
        import torch
        from transformers import AutoModelForSequenceClassification, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(checkpoint, local_files_only=True)
        model = AutoModelForSequenceClassification.from_pretrained(checkpoint, local_files_only=True)
        model.eval()
    except Exception as exc:  # noqa: BLE001
        raise ModelLoadError(
            f"cannot load local alignscore checkpoint '{checkpoint}'"
        ) from exc

    out = []
    with torch.no_grad():
        for mi in metric_inputs:
            claim = mi.generated_texts or ""
            context_tokens = "\n".join(mi.retrieved_contents or []).split()
            windows = [
                " ".join(context_tokens[i : i + window_tokens])
                for i in range(0, max(len(context_tokens), 1), window_tokens)
            ]
            best = 0.0
            for w in windows:
                enc = tok(w, claim, truncation=True, max_length=512, return_tensors="pt")
                logits = model(**enc).logits
                prob = torch.softmax(logits, dim=-1)
                # convention: index 1 = aligned/entailed when binary; else max prob of non-contradiction
                p = prob[0, 1].item() if prob.shape[-1] >= 2 else prob[0, 0].item()
                best = max(best, p)
            out.append(best)
    return out


def mini_check_batch(
    metric_inputs: list[MetricInput],
    checkpoint: str = DEFAULT_MINICHECK_CHECKPOINT,
    **_: Any,
) -> list[float]:
    """MiniCheck fact verification: p(supported) of the generated claim given
    retrieved documents via a Flan-T5 yes/no head."""
    import torch

    tok, model = _load_seq2seq(checkpoint)
    yes_id = tok("Yes", add_special_tokens=False)["input_ids"][0]
    no_id = tok("No", add_special_tokens=False)["input_ids"][0]
    out = []
    with torch.no_grad():
        for mi in metric_inputs:
            doc = "\n".join(mi.retrieved_contents or [])
            claim = mi.generated_texts or ""
            prompt = f"Document: {doc}\nClaim: {claim}\nIs the claim supported by the document? Answer Yes or No."
            enc = tok(prompt, truncation=True, max_length=1024, return_tensors="pt")
            start = torch.full((1, 1), model.config.decoder_start_token_id)
            logits = model(**enc, decoder_input_ids=start).logits[:, 0, :]
            pair = torch.stack([logits[:, yes_id], logits[:, no_id]], dim=1)
            out.append(torch.softmax(pair, dim=1)[0, 0].item())
    return out
