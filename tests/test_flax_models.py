"""Real-model tests for the Flax backends.

The reference gates real-model coverage behind a tiny downloaded GGUF
(`pytests/test_embed_gguf.py:23-37`, marker `gguf`). This image has
zero egress, so the equivalent is a tiny random-weight GPT-2 checkpoint
+ trained byte-level BPE tokenizer synthesized on disk — small enough
to build in seconds, real enough that `FlaxEmbedModel`/`FlaxChatModel`
exercise the actual transformers load, template, jitted decode, and
token-level grammar-constraint paths (not the Echo/Hash dummies).
"""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.flaxmodel


def test_flax_embed_model(tiny_model_dir):
    from muninn_tpu.models.embed import FlaxEmbedModel, load_embed_model, embed
    from muninn_tpu.models.registry import registry

    m = FlaxEmbedModel(tiny_model_dir)
    assert m.dim == 32
    assert m.n_ctx <= 8192  # reference cap, src/llama_embed.c:70-80
    vecs = m.embed(["hello world", "quick brown fox", "hello world"])
    assert vecs.shape == (3, 32) and vecs.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)
    # deterministic: same text -> same embedding
    np.testing.assert_allclose(vecs[0], vecs[2], atol=1e-6)
    assert not np.allclose(vecs[0], vecs[1], atol=1e-3)

    # registry round trip via the public loader
    load_embed_model("tiny-enc", tiny_model_dir)
    vecs2 = embed("tiny-enc", ["hello world"])
    np.testing.assert_allclose(vecs2[0], vecs[0], atol=1e-6)
    registry.remove("tiny-enc")

    # tokenizer surface works on the real vocab
    from muninn_tpu.text import token_count, tokenize

    ids = tokenize(m, "hello world")
    assert ids and all(isinstance(i, int) for i in ids)
    assert token_count(m, "hello world") == len(ids)


def test_flax_embed_feeds_index(tiny_model_dir):
    from muninn_tpu.index.flat import FlatIndex
    from muninn_tpu.models.embed import FlaxEmbedModel

    m = FlaxEmbedModel(tiny_model_dir)
    texts = ["alpha beta", "gamma delta", "epsilon zeta", "alpha beta!"]
    vecs = m.embed(texts)
    idx = FlatIndex(32, "cosine")
    idx.insert(np.arange(len(texts)), vecs)
    ids, dists = idx.search(vecs[0], k=2)  # single query -> 1-D results
    assert int(np.asarray(ids)[0]) == 0
    assert float(np.asarray(dists)[0]) < 1e-5


def test_flax_chat_generate_and_batch(tiny_model_dir):
    from muninn_tpu.models.chat import FlaxChatModel

    m = FlaxChatModel(tiny_model_dir)
    out = m.generate("Say something.", max_tokens=8)
    assert isinstance(out, str)

    outs = m.generate_batch(
        [f"Prompt {i}" for i in range(4)], max_tokens=8
    )
    assert len(outs) == 4 and all(isinstance(o, str) for o in outs)
    # greedy decode is deterministic
    outs2 = m.generate_batch([f"Prompt {i}" for i in range(4)], max_tokens=8)
    assert outs == outs2


def test_flax_chat_grammar_valid_json_no_repair(tiny_model_dir):
    """100% valid JSON from the token-level constraint alone: the raw
    decode output parses — no json_output repair involved (the
    reference's GBNF guarantee, src/llama_constants.h:29-65)."""
    from muninn_tpu.models.chat import FlaxChatModel
    from muninn_tpu.text.grammar import GRAMMAR_NER, GRAMMAR_RE

    m = FlaxChatModel(tiny_model_dir)
    prompts = [
        "Extract entities from: Ada met Babbage.",
        "Extract entities from: London is big.",
        "Extract entities from: numbers 123.",
        "Extract entities from: fox dog.",
    ]
    outs = m.generate_batch(
        prompts, grammar=GRAMMAR_NER, max_tokens=48, grammar_eos_bias=8.0
    )
    assert len(outs) == 4
    for o in outs:
        val = json.loads(o)  # raw parse: would raise if repair were needed
        ents = val["entities"] if isinstance(val, dict) else val
        assert isinstance(ents, list)

    out = m.generate(
        "Extract relations.", grammar=GRAMMAR_RE, max_tokens=48,
        grammar_eos_bias=8.0,
    )
    val = json.loads(out)
    rels = val["relations"] if isinstance(val, dict) else val
    assert isinstance(rels, list)


def test_flax_chat_through_registry_and_extract(tiny_model_dir):
    """The extraction surface runs end-to-end on a real Flax model:
    grammar-constrained output always yields well-formed dicts."""
    from muninn_tpu.models.chat import load_chat_model
    from muninn_tpu.models.registry import registry
    from muninn_tpu.text import extract_entities

    load_chat_model("tiny-chat", tiny_model_dir)
    try:
        out = extract_entities("tiny-chat", "Ada met Babbage.", max_tokens=48)
        assert isinstance(out["entities"], list)
        for e in out["entities"]:
            assert set(e) == {"name", "type"}
    finally:
        registry.remove("tiny-chat")


def test_chat_template_special_cases(tiny_model_dir):
    """Reference chat-template special cases (src/llama_chat.c:424-494):
    Gemma-4 <|turn> hand-rendering when the template won't execute, and
    Qwen think-injection when the template mentions enable_thinking."""
    from muninn_tpu.models.chat import FlaxChatModel

    m = FlaxChatModel(tiny_model_dir)
    # broken Jinja + <turn|> marker -> hand-rendered Gemma-4 format
    m._tok.chat_template = "{% broken jinja <turn|> %}"
    out = m._render("hi", "sys")
    assert out == "<bos><|turn>system\nsys<turn|>\n<|turn>user\nhi<turn|>\n<|turn>model\n"
    out = m._render("hi", None)
    assert out == "<bos><|turn>user\nhi<turn|>\n<|turn>model\n"

    # enable_thinking template -> closed think block injected iff skip_think
    m._tok.chat_template = (
        "{%- for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n"
        "{%- endfor %}{# enable_thinking #}assistant:"
    )
    assert m._render("q", None, skip_think=True).endswith("<think>\n\n</think>\n\n")
    assert not m._render("q", None, skip_think=False).endswith("</think>\n\n")


def test_grammar_decode_program_is_cached(tiny_model_dir):
    """Repeated grammar decodes with the same static config must reuse
    ONE jitted program (a fresh @jax.jit closure per call retraces the
    whole KV-cache scan — 25-200 s-class through the TPU tunnel) and
    the grammar tables must build once per (grammar, vocab)."""
    from muninn_tpu.models.chat import FlaxChatModel
    from muninn_tpu.text.grammar import GRAMMAR_NER

    m = FlaxChatModel(tiny_model_dir)
    prompts = ["Extract: Ada.", "Extract: Bob."]
    out1 = m.generate_batch(prompts, grammar=GRAMMAR_NER, max_tokens=8)
    assert len(m._decode_fns) == 1
    fn = next(iter(m._decode_fns.values()))
    tg = m._token_grammar(GRAMMAR_NER)
    tabs = tg._decode_tables
    out2 = m.generate_batch(prompts, grammar=GRAMMAR_NER, max_tokens=8)
    assert len(m._decode_fns) == 1
    assert next(iter(m._decode_fns.values())) is fn
    assert tg._decode_tables is tabs  # tables not rebuilt
    assert out1 == out2
    # a different static config gets its own cached program
    m.generate_batch(prompts, grammar=GRAMMAR_NER, max_tokens=12)
    assert len(m._decode_fns) == 2
