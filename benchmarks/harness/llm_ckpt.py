"""Realistic-SHAPE synthesized LLM checkpoints for TPU measurement.

Zero egress blocks real weights, so the reference's model-size sweeps
(``/root/reference/benchmarks/harness/treatments/embed.py`` measures
real GGUF models end-to-end) are mirrored here with random-weight
checkpoints whose SHAPES match production models:

- ``minilm-shape``: 6 layers / 384 hidden / 6 heads, ~30k vocab —
  the all-MiniLM-L6-v2 geometry (22M params), the reference's own
  gated-test model (``pytests/test_embed_gguf.py``).
- ``gpt2s-shape``: 12 layers / 768 hidden / 12 heads, ~30k vocab —
  GPT-2-small geometry (~124M params), a realistic small chat decoder.

Throughput through the MXU depends on shapes, not weight values, so
these measure the actual embed/decode engine paths; quality metrics
are meaningless on random weights and must not be read off these runs.

Checkpoints are synthesized once and cached under
``benchmarks/data/llm/<kind>/`` (gitignored); the tokenizer is a
ByteLevel BPE trained to the full vocab on a deterministic synthetic
corpus so token ids span the real embedding-table range.
"""

from __future__ import annotations

from pathlib import Path

SHAPES = {
    "minilm-shape": dict(n_layer=6, n_embd=384, n_head=6, vocab=30522),
    # all-mpnet-base geometry (12L/768d, ~110M) — the reference's
    # "bigger encoder" sweep point (its MPNet/BGE chart series)
    "mpnet-shape": dict(n_layer=12, n_embd=768, n_head=12, vocab=30522),
    "gpt2s-shape": dict(n_layer=12, n_embd=768, n_head=12, vocab=30522),
}

DATA_DIR = Path(__file__).resolve().parents[1] / "data" / "llm"


def _synth_corpus(n_words: int = 40000, seed: int = 7) -> list[str]:
    """Deterministic pseudo-word corpus with a zipf-ish frequency
    profile — enough distinct material for the BPE trainer to reach a
    ~30k vocab."""
    import numpy as np

    rng = np.random.default_rng(seed)
    syll = ["ba", "ko", "ri", "ten", "al", "mu", "zo", "qua", "vin",
            "eth", "or", "sa", "li", "dro", "ne", "pix", "ul", "gra"]
    words = [
        "".join(rng.choice(syll, rng.integers(2, 5)))
        for _ in range(n_words)
    ]
    lines = []
    for _ in range(6000):
        k = rng.integers(6, 14)
        idx = (rng.zipf(1.3, k) - 1) % n_words
        lines.append(" ".join(words[i] for i in idx) + ".")
    return lines


def ensure_checkpoint(kind: str) -> str:
    """Synthesize (once, disk-cached) the checkpoint directory for
    ``kind`` and return its path."""
    shape = SHAPES[kind]
    d = DATA_DIR / kind
    if (d / "config.json").exists() and (d / "tokenizer.json").exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    from tokenizers import ByteLevelBPETokenizer
    from transformers import (
        GPT2Config,
        GPT2TokenizerFast,
        FlaxGPT2LMHeadModel,
    )

    bt = ByteLevelBPETokenizer()
    bt.train_from_iterator(
        _synth_corpus(), vocab_size=shape["vocab"], min_frequency=1,
        special_tokens=["<|endoftext|>"],
    )
    bt.save_model(str(d))
    tok = GPT2TokenizerFast(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt"),
        bos_token="<|endoftext|>", eos_token="<|endoftext|>",
        unk_token="<|endoftext|>",
    )
    tok.save_pretrained(str(d))
    cfg = GPT2Config(
        vocab_size=tok.vocab_size, n_positions=1024,
        n_embd=shape["n_embd"], n_layer=shape["n_layer"],
        n_head=shape["n_head"],
        bos_token_id=tok.bos_token_id, eos_token_id=tok.eos_token_id,
    )
    model = FlaxGPT2LMHeadModel(cfg, seed=0)
    model.save_pretrained(str(d))
    # tokenizer.json marks the checkpoint complete (written last)
    tok.backend_tokenizer.save(str(d / "tokenizer.json"))
    return str(d)
