"""Model-gated REAL-weight tests (round-4 VERDICT task #7).

The reference downloads a tiny real GGUF model for its ``gguf``-marked
tests (``pytests/test_embed_gguf.py:3,23-37``). This image has zero
egress, so these are gated instead: they run only when
``MUNINN_MODEL_DIR`` points at a real local HF checkpoint directory and
skip cleanly otherwise. Unlike ``test_flax_models.py`` (synthesized
random-weight checkpoints — loads/shapes/templates/grammar machinery),
these assert *semantic* properties only trained weights have.

Activation (see README):

    MUNINN_MODEL_DIR=/path/to/checkpoints python -m pytest -m model

Layout: ``$MUNINN_MODEL_DIR/embed`` (an encoder, e.g. a MiniLM-class
model) and/or ``$MUNINN_MODEL_DIR/chat`` (a causal LM). If neither
subdirectory exists, the root itself is tried for both roles; a role
with no usable checkpoint skips its tests.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.model

_ROOT = os.environ.get("MUNINN_MODEL_DIR")

if not _ROOT:
    pytest.skip(
        "MUNINN_MODEL_DIR not set — real-weight tests are opt-in "
        "(zero-egress image cannot download checkpoints)",
        allow_module_level=True,
    )

pytest.importorskip("transformers")


def _role_dir(role: str) -> str | None:
    sub = Path(_ROOT) / role
    if (sub / "config.json").exists():
        return str(sub)
    if (Path(_ROOT) / "config.json").exists():
        return str(_ROOT)
    return None


@pytest.fixture(scope="module")
def embed_model():
    path = _role_dir("embed")
    if path is None:
        pytest.skip(f"no embed checkpoint under {_ROOT}")
    from muninn_tpu.models.embed import FlaxEmbedModel

    return FlaxEmbedModel(path)


@pytest.fixture(scope="module")
def chat_model():
    path = _role_dir("chat")
    if path is None:
        pytest.skip(f"no chat checkpoint under {_ROOT}")
    from muninn_tpu.models.chat import FlaxChatModel

    return FlaxChatModel(path)


PARAPHRASES = [
    ("The cat sat on the mat.", "A cat was sitting on a rug."),
    ("How do I reset my password?", "What is the way to change my login password?"),
    ("The company reported strong quarterly earnings.",
     "Quarterly profits at the firm were robust."),
]
UNRELATED = [
    "Photosynthesis converts sunlight into chemical energy.",
    "The 1998 World Cup final was held in Paris.",
    "Tectonic plates drift a few centimeters per year.",
]


def test_embed_paraphrases_beat_unrelated(embed_model):
    """Trained weights must place paraphrases closer than unrelated
    text — the property no random-weight checkpoint has (reference
    asserts real-model embedding sanity the same way)."""
    firsts = [a for a, _ in PARAPHRASES]
    seconds = [b for _, b in PARAPHRASES]
    va = embed_model.embed(firsts)
    vb = embed_model.embed(seconds)
    vu = embed_model.embed(UNRELATED)
    # embeddings are L2-normalized by the model: dot == cosine
    para_cos = np.sum(va * vb, axis=1)
    unrel_cos = np.array(
        [va[i] @ vu[j] for i in range(len(va)) for j in range(len(vu))]
    )
    assert para_cos.min() > unrel_cos.max(), (
        f"paraphrase cos {para_cos} not separated from unrelated "
        f"{unrel_cos.max():.3f}"
    )


def test_embed_retrieval_self_consistency(embed_model):
    """Indexing the paraphrase corpus, each sentence's nearest OTHER
    sentence is its paraphrase partner (end-to-end embed -> index)."""
    from muninn_tpu.index.flat import FlatIndex

    texts = [t for pair in PARAPHRASES for t in pair] + UNRELATED
    vecs = embed_model.embed(texts)
    idx = FlatIndex(vecs.shape[1], "cosine")
    idx.insert(np.arange(len(texts)), vecs)
    ids, _ = idx.search(vecs, k=2)
    ids = np.asarray(ids)
    for pair_i in range(len(PARAPHRASES)):
        a, b = 2 * pair_i, 2 * pair_i + 1
        assert ids[a, 1] == b, (a, ids[a])
        assert ids[b, 1] == a, (b, ids[b])


def test_chat_grammar_valid_decode(chat_model):
    """Grammar-constrained decode on real weights emits output the
    grammar's own DFA accepts end-to-end (and yes/no stays binary)."""
    from muninn_tpu.text.grammar import (
        GRAMMAR_YES_NO, GRAMMAR_NER, compile_gbnf,
    )

    out = chat_model.generate(
        "Is the sky sometimes blue? Answer yes or no.",
        grammar=GRAMMAR_YES_NO, max_tokens=4,
    )
    assert out.strip() in ("yes", "no"), out

    ner = chat_model.generate(
        "Extract the entities: Marie Curie worked in Paris at the "
        "Sorbonne.", grammar=GRAMMAR_NER, max_tokens=96,
    )
    dfa = compile_gbnf(GRAMMAR_NER)
    # alive = never grammar-violating even if budget-truncated; the
    # decode path itself completes truncations, so full acceptance is
    # the expected (stronger) outcome
    assert dfa.alive(ner), f"decode left the grammar: {ner!r}"
    assert dfa.accepts(ner), f"decode not completed to acceptance: {ner!r}"


def test_chat_json_extraction_parses(chat_model):
    """The NER extraction flow on real weights yields structured
    entities with names drawn from the input (the llama_er
    adjudication path's input contract)."""
    from muninn_tpu.models.registry import registry
    from muninn_tpu.text.extract import extract_entities

    registry.add("gated-chat", chat_model)
    try:
        val = extract_entities(
            "gated-chat",
            "Ada Lovelace collaborated with Charles Babbage in London.",
        )
    finally:
        registry.remove("gated-chat")
    ents = val["entities"]
    assert isinstance(ents, list)
    assert json.loads(json.dumps(val)) == val
    for e in ents:
        assert isinstance(e.get("name"), str) and e["name"], e
