"""Build tiny random-init HF checkpoints on disk for model-scorer tests.

Zero-egress image: the real BART/BERT/T5 checkpoints behind the model-backed
generation metrics (reference ``evaluation/metrics/generation.py:885-1003``,
``unieval.py:18-116``) cannot be downloaded, but the *scoring math* is
checkpoint-agnostic. These helpers construct minimal-config models with a
whitespace word-level tokenizer, save them with ``save_pretrained``, and the
scorers load them through the same ``AutoTokenizer``/``AutoModel*`` path as
production checkpoints.
"""

from __future__ import annotations

import os

_WORDS = (
    "the capital of france is paris a city in europe cats sit on mats "
    "quantum flux capacitors reverse polarity entirely unrelated gibberish "
    "document claim answer question response reference supported by "
    "coherent consistent fluent relevant grounded evidence retrieval "
    "context window extra filler tokens alpha beta gamma delta epsilon"
).split()


def build_seq2seq_checkpoint(path: str, seed: int = 0) -> str:
    """Tiny BART (seq2seq LM) + word-level tokenizer; for BARTScore/UniEval/MiniCheck."""
    import torch
    from transformers import BartConfig, BartForConditionalGeneration

    os.makedirs(path, exist_ok=True)
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "Yes": 4, "No": 5}
    for w in _WORDS:
        vocab.setdefault(w, len(vocab))
    _save_wordlevel_tokenizer(path, vocab)

    torch.manual_seed(seed)
    config = BartConfig(
        vocab_size=len(vocab),
        d_model=16,
        encoder_layers=1,
        decoder_layers=1,
        encoder_attention_heads=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=32,
        decoder_ffn_dim=32,
        max_position_embeddings=128,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=2,
    )
    BartForConditionalGeneration(config).save_pretrained(path)
    return path


def build_encoder_checkpoint(path: str, seed: int = 1) -> str:
    """Tiny BERT encoder + WordPiece tokenizer; for BERTScore."""
    import torch
    from transformers import BertConfig, BertModel

    os.makedirs(path, exist_ok=True)
    n_vocab = _save_bert_tokenizer(path)
    torch.manual_seed(seed)
    config = BertConfig(
        vocab_size=n_vocab,
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=32,
        max_position_embeddings=512,
    )
    BertModel(config).save_pretrained(path)
    return path


def build_seqcls_checkpoint(path: str, seed: int = 2, num_labels: int = 2) -> str:
    """Tiny BERT sequence classifier; for AlignScore."""
    import torch
    from transformers import BertConfig, BertForSequenceClassification

    os.makedirs(path, exist_ok=True)
    n_vocab = _save_bert_tokenizer(path)
    torch.manual_seed(seed)
    config = BertConfig(
        vocab_size=n_vocab,
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=32,
        max_position_embeddings=512,
        num_labels=num_labels,
    )
    BertForSequenceClassification(config).save_pretrained(path)
    return path


def _save_wordlevel_tokenizer(path: str, vocab: dict[str, int]) -> None:
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="<pad>",
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
        # BART-style seq2seq models reject token_type_ids
        model_input_names=["input_ids", "attention_mask"],
    )
    fast.save_pretrained(path)


def _save_bert_tokenizer(path: str) -> int:
    from transformers import BertTokenizerFast

    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = specials + sorted(set(_WORDS)) + ["Yes", "No"]
    vocab_file = os.path.join(path, "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(words) + "\n")
    BertTokenizerFast(vocab_file=vocab_file).save_pretrained(path)
    return len(words)


def build_causal_checkpoint(path: str, seed: int = 3) -> str:
    """Tiny GPT-2 causal LM + word-level tokenizer; for FlagLLM rerankers."""
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    os.makedirs(path, exist_ok=True)
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "Yes": 4, "No": 5}
    for w in _WORDS:
        vocab.setdefault(w, len(vocab))
    _save_wordlevel_tokenizer(path, vocab)
    torch.manual_seed(seed)
    config = GPT2Config(
        vocab_size=len(vocab),
        n_embd=16,
        n_layer=2,
        n_head=2,
        n_positions=256,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    GPT2LMHeadModel(config).save_pretrained(path)
    return path
