"""Text/LLM layer: tokenizers, embed/chat registry, extraction, group
labeling, ER cascade — all through the dummy-model backends (the
reference's MUNINN_TESTING dummy-injection strategy,
src/llama_common.c:321-348, test/test_llama_chat.c)."""

import json
import zlib

import numpy as np
import pytest

from muninn_tpu.models import chat as chat_mod
from muninn_tpu.models import embed as embed_mod
from muninn_tpu.models.registry import ModelRegistry, ModelType, registry
from muninn_tpu.text import extract as ex
from muninn_tpu.text.tokenize import HashTokenizer, token_count, tokenize, tokenize_text
from muninn_tpu.er.resolve import Entity, resolve_entities
from muninn_tpu.index.flat import FlatIndex


@pytest.fixture(autouse=True)
def clean_registry():
    registry._models.clear()
    yield
    registry._models.clear()


def test_hash_tokenizer_deterministic():
    t = HashTokenizer()
    a = t.tokenize("Hello, world! Hello")
    b = t.tokenize("Hello, world! Hello")
    assert a == b
    assert t.pieces("Hello, world!") == ["Hello", ",", "world", "!"]
    assert t.token_count("one two three") == 3
    assert all(0 <= i < t.VOCAB_SIZE for i in a)


def test_tokenize_functions_via_model():
    m = embed_mod.load_embed_model("e1", dim=16)
    assert tokenize(m, "a b") == m.tokenizer.tokenize("a b")
    assert tokenize_text(m, "a b") == ["a", "b"]
    assert token_count(m, "a b c") == 3


def test_embed_model_registry_and_dim():
    embed_mod.load_embed_model("emb", dim=32)
    assert embed_mod.model_dim("emb") == 32
    v = embed_mod.embed("emb", ["hello world", "hello world", "totally different"])
    assert v.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)
    # identical texts embed identically; similar > dissimilar
    np.testing.assert_allclose(v[0], v[1])
    assert v[0] @ v[1] > v[0] @ v[2]


def test_registry_type_checks():
    embed_mod.load_embed_model("emb", dim=8)
    chat_mod.load_chat_model("c")
    with pytest.raises(TypeError):
        registry.find_type("emb", ModelType.CHAT)
    with pytest.raises(KeyError):
        registry.find("missing")
    with pytest.raises(ValueError):
        chat_mod.load_chat_model("c")  # duplicate name
    assert registry.names(ModelType.CHAT) == ["c"]


def test_registry_cap():
    r = ModelRegistry()
    r.MAX_MODELS = 2
    r.add("a", object.__new__(chat_mod.EchoChatModel))
    r.add("b", object.__new__(chat_mod.EchoChatModel))
    with pytest.raises(RuntimeError):
        r.add("d", object.__new__(chat_mod.EchoChatModel))


def test_strip_think_block():
    s = chat_mod.strip_think_block
    assert s("<think>reasoning</think>answer") == "answer"
    assert s("answer") == "answer"
    # truncated think block -> empty (src/llama_chat.c:506-530)
    assert s("<think>never closed") == ""


def test_json_output_normalization():
    j = chat_mod.json_output
    assert j('{"a": 1}') == {"a": 1}
    assert j("[1, 2]", wrap_key="xs") == {"xs": [1, 2]}
    assert j("not json at all", wrap_key="xs") == {"xs": []}
    # truncation salvage
    out = j('{"entities": [{"name": "Bob", "type": "PERSON"}, {"na')
    assert isinstance(out, dict)
    # empty / think-only output returns the empty envelope (an
    # all-<think> generation stripped to "" used to UnboundLocalError
    # out of the salvage loop — found by a 3000-case repair fuzz)
    assert j("") == {"items": []}
    assert j("<think>reasoning only") == {"items": []}
    assert j("   \n") == {"items": []}


def test_chat_and_extraction_pipeline():
    chat_mod.load_chat_model("c")
    text = "Alice Smith met Bob Jones in Paris."
    out = ex.extract_entities("c", text)
    names = {e["name"] for e in out["entities"]}
    assert "Alice Smith" in names and "Bob Jones" in names and "Paris" in names

    both = ex.extract_ner_re("c", text)
    assert both["entities"]
    assert all({"head", "relation", "tail"} <= set(r) for r in both["relations"])

    batch = ex.extract_entities_batch("c", [text, "Charlie visited Rome."])
    assert len(batch) == 2

    s = ex.summarize("c", "word " * 200, max_words=10)
    assert len(s.split()) <= 25


def test_supervised_entity_types():
    chat_mod.load_chat_model("c")
    out = ex.extract_entities("c", "Alice went to Paris.", entity_types=["PERSON"])
    assert isinstance(out["entities"], list)


def test_label_groups():
    chat_mod.load_chat_model("c")
    rows = ex.label_groups(
        "c",
        {"g1": ["Paris", "Rome", "Berlin"], "g2": ["solo"]},
        min_group_size=2,
    )
    assert len(rows) == 1
    gid, label, count = rows[0]
    assert gid == "g1" and count == 3 and label


def test_chat_function_surface():
    chat_mod.load_chat_model("c")
    out = chat_mod.chat("c", "Summarize: the quick brown fox", max_tokens=8)
    assert isinstance(out, str)


def test_er_cascade_clusters_duplicates():
    embed_mod.load_embed_model("emb", dim=32)
    names = [
        "Acme Corporation", "ACME Corporation", "Acme Corp",
        "Globex Inc", "Globex Incorporated",
        "Wayne Enterprises",
    ]
    ents = [Entity(id=str(i), name=n, source=f"s{i%2}") for i, n in enumerate(names)]
    vecs = embed_mod.embed("emb", names)
    idx = FlatIndex(32, "cosine", use_pallas=False)
    idx.insert(np.arange(len(names)), vecs)
    out = resolve_entities(ents, idx, k=4, dist_threshold=0.45, jw_weight=0.7)
    c = out["clusters"]
    assert c["0"] == c["1"] == c["2"], c       # Acme variants merge
    assert c["3"] == c["4"], c                 # Globex variants merge
    assert c["5"] not in (c["0"], c["3"]), c   # Wayne stays alone


def test_er_same_source_guard():
    embed_mod.load_embed_model("emb", dim=32)
    names = ["Acme Corp", "Acme Corp"]
    ents = [Entity(id="0", name=names[0], source="s"), Entity(id="1", name=names[1], source="s")]
    vecs = embed_mod.embed("emb", names)
    idx = FlatIndex(32, "cosine", use_pallas=False)
    idx.insert([0, 1], vecs)
    out = resolve_entities(ents, idx, k=2, type_guard="same_source")
    c = out["clusters"]
    assert c["0"] != c["1"]  # same source may not merge


def test_json_output_nested_truncation_recovers_items():
    out = chat_mod.json_output(
        '{"entities": [{"name": "Alice", "type": "PERSON"}, {"name": "Bo'
    )
    ents = out.get("entities", [])
    assert any(e.get("name") == "Alice" for e in ents if isinstance(e, dict))


def test_json_output_think_then_json():
    out = chat_mod.json_output('<think>hmm</think>{"entities": []}')
    assert out == {"entities": []}


# ── ER quality metrics + worked pipeline (reference examples/er_v3) ──


def test_bcubed_and_pairwise_known_values():
    from muninn_tpu.er import bcubed_f1, pairwise_f1

    # perfect clustering
    pred = {"a": 0, "b": 0, "c": 1}
    assert bcubed_f1(pred, pred)["f1"] == 1.0
    assert pairwise_f1(pred, pred)["f1"] == 1.0
    # everything merged: recall 1, precision low
    merged = {k: 0 for k in pred}
    bc = bcubed_f1(merged, pred)
    assert bc["recall"] == 1.0 and bc["precision"] < 1.0
    # hand-checked: pred {ab}{c} vs gold {ac}{b}
    pred2 = {"a": 0, "b": 0, "c": 1}
    gold2 = {"a": 0, "b": 1, "c": 0}
    bc2 = bcubed_f1(pred2, gold2)
    # per-element precision: a:1/2 b:1/2 c:1 -> 2/3; symmetric recall
    assert abs(bc2["precision"] - 2 / 3) < 1e-3
    assert abs(bc2["recall"] - 2 / 3) < 1e-3
    pw2 = pairwise_f1(pred2, gold2)
    assert pw2["precision"] == 0.0 and pw2["recall"] == 0.0
    # disjoint element sets -> zeros
    assert bcubed_f1({"x": 0}, {"y": 0})["f1"] == 0.0


def test_er_pipeline_example_quality():
    """The worked example resolves the labeled org dataset with
    measured quality (the reference asserts F1 on its er_v3 fixture)."""
    from examples.er_pipeline.pipeline import run

    out = run(verbose=False)
    assert out["bcubed"]["f1"] >= 0.85, out["bcubed"]
    assert out["pairwise"]["f1"] >= 0.75, out["pairwise"]


# ── real Flax model paths (tiny local model, conftest fixture) ──


def test_flax_embed_model_end_to_end(tiny_model_dir, rng):
    """FlaxEmbedModel loads a real HF dir, embeds batched + normalized,
    deterministically, and its vectors drive an index search — the
    reference's gated GGUF embed test role (pytests/test_embed_gguf.py)."""
    import numpy as np
    from muninn_tpu.index.flat import FlatIndex
    from muninn_tpu.models.embed import embed, load_embed_model, model_dim
    from muninn_tpu.models.registry import registry

    m = load_embed_model("tiny-embed", tiny_model_dir)
    try:
        texts = ["Ada wrote programs", "Turing founded the field",
                 "Ada wrote programs"]
        v = embed("tiny-embed", texts)
        assert v.shape == (3, model_dim("tiny-embed"))
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)
        np.testing.assert_allclose(v[0], v[2], atol=1e-5)  # deterministic
        idx = FlatIndex(v.shape[1], "cosine")
        idx.insert(np.arange(3), v)
        ids, _ = idx.search(v[1], k=1)
        assert ids[0] == 1
    finally:
        registry.remove("tiny-embed")


def test_flax_tokenizer_functions(tiny_model_dir):
    from muninn_tpu.models.embed import load_embed_model
    from muninn_tpu.models.registry import registry
    from muninn_tpu.text.tokenize import token_count, tokenize, tokenize_text

    m = load_embed_model("tiny-embed2", tiny_model_dir)
    try:
        ids = tokenize(m, "Ada Lovelace wrote")
        assert len(ids) == token_count(m, "Ada Lovelace wrote") > 0
        assert len(tokenize_text(m, "Ada Lovelace wrote")) == len(ids)
    finally:
        registry.remove("tiny-embed2")


def test_er_llm_borderline_adjudication():
    """Borderline pairs (within borderline_delta of the base threshold)
    are adjudicated by one batched grammar-constrained yes/no decode
    when a chat model is supplied; without one they are rejected (the
    reference's strict rule)."""
    from muninn_tpu.native import jaro_winkler_batch

    chat_mod.load_chat_model("judge")

    # controlled vectors: pair (0,1) cos=0.8, pair (2,3) cos=0.85,
    # groups orthogonal
    v = np.zeros((4, 8), np.float32)
    v[0, 0] = 1.0
    v[1, 0], v[1, 1] = 0.8, 0.6
    v[2, 4] = 1.0
    v[3, 4], v[3, 5] = 0.85, np.sqrt(1 - 0.85**2)
    names = ["Acme Corporation", "Acme Holdings",
             "Zeta Systems", "Binford Tools"]
    ents = [Entity(id=str(i), name=n) for i, n in enumerate(names)]
    idx = FlatIndex(8, "cosine", use_pallas=False)
    idx.insert(np.arange(4), v)

    # precondition: both blended scores sit inside the borderline band
    jw = jaro_winkler_batch(
        [names[0].lower(), names[2].lower()],
        [names[1].lower(), names[3].lower()],
    )
    s01 = 0.2 * float(jw[0]) + 0.8 * 0.8
    s23 = 0.2 * float(jw[1]) + 0.8 * 0.85
    base, delta = 0.8, 0.06
    assert base - delta <= s01 < base + delta, s01
    assert base - delta <= s23 < base + delta, s23

    kw = dict(k=2, dist_threshold=0.2, jw_weight=0.2, borderline_delta=delta)
    # strict rule: both pairs rejected
    c = resolve_entities(ents, idx, **kw)["clusters"]
    assert len(set(c.values())) == 4, c
    # adjudicated: echo judge says yes iff the names share a token, so
    # the Acme pair merges and the unrelated pair stays split
    c = resolve_entities(ents, idx, chat_model="judge", **kw)["clusters"]
    assert c["0"] == c["1"], c
    assert c["2"] != c["3"], c

    # graded mode: echo judge rates 0-10 by token Jaccard; the Acme
    # pair shares 1 of 3 tokens (conf 3), so a 0.3 bar merges it and a
    # 0.5 bar does not — the knob actually changes the decision
    c = resolve_entities(
        ents, idx, chat_model="judge",
        adjudicate_min_confidence=0.3, **kw,
    )["clusters"]
    assert c["0"] == c["1"], c
    assert c["2"] != c["3"], c
    c = resolve_entities(
        ents, idx, chat_model="judge",
        adjudicate_min_confidence=0.5, **kw,
    )["clusters"]
    assert c["0"] != c["1"], c

    # per-pair context hook: the callable's output reaches the prompt
    from muninn_tpu.models.registry import ModelType, registry

    class _Recorder:
        model_type = ModelType.CHAT
        prompts: list = []

        def generate_batch(self, prompts, **kw):
            self.prompts = list(prompts)
            return ["no"] * len(prompts)

    rec = _Recorder()
    registry.add("recorder", rec)
    try:
        resolve_entities(
            ents, idx, chat_model="recorder",
            adjudicate_context=lambda a, b: f"CTX<{a.name}|{b.name}>",
            **kw,
        )
        assert rec.prompts and all("CTX<" in p for p in rec.prompts), rec.prompts
        # default context: source/type fields appear when present
        ents_src = [
            Entity(id=e.id, name=e.name, source=f"db{i}")
            for i, e in enumerate(ents)
        ]
        resolve_entities(ents_src, idx, chat_model="recorder", **kw)
        assert all("source=" in p for p in rec.prompts), rec.prompts
    finally:
        registry.remove("recorder")


def test_er_confidence_grammar_compiles():
    """GRAMMAR_CONFIDENCE accepts exactly the integers 0..10."""
    from muninn_tpu.text.grammar import GRAMMAR_CONFIDENCE, compile_gbnf

    dfa = compile_gbnf(GRAMMAR_CONFIDENCE)
    for s in [str(i) for i in range(11)]:
        assert dfa.accepts(s), s
    for s in ("11", "-1", "yes", "3.5", ""):
        assert not dfa.accepts(s), s


def test_label_groups_quote_only_output():
    """A model answering only quote characters must yield an empty
    label, not IndexError (kills the whole kg_graphrag pipeline)."""
    from muninn_tpu.models.registry import registry
    from muninn_tpu.text import label_groups

    class QuoteModel:
        from muninn_tpu.models.registry import ModelType
        model_type = ModelType.CHAT

        def generate(self, *a, **k):
            return '""'

    registry.add("quote-model", QuoteModel())
    try:
        rows = label_groups("quote-model", {"g1": ["a", "b", "c"]})
        assert rows == [("g1", "", 3)]
    finally:
        registry.remove("quote-model")


def test_er_guards_and_f1_on_planted_variants():
    """Property soak representative (30-trial campaign ran clean):
    planted variant groups with fully-distinct base names resolve to
    B-Cubed F1 = 1.0 at dist_threshold=0.35; the same_source guard
    yields all-singleton clusters when every entity shares a source
    (guards are edge-level, so transitive merges can't smuggle one in
    when there are no third parties)."""
    from muninn_tpu.er.metrics import bcubed_f1

    rng = np.random.default_rng(31)
    firsts = ["Alexander", "Katherine", "Jonathan", "Elizabeth",
              "Sebastian", "Valentina", "Genevieve", "Penelope"]
    lasts = ["Hamilton", "Vandermeer", "Okonkwo", "Castellano",
             "Lindqvist", "Abernathy", "Nakamura", "Oyelaran"]

    def ngram_embed(names, dim=64):
        out = np.zeros((len(names), dim), np.float32)
        for i, nm in enumerate(names):
            s = f"^{nm.lower()}$"
            for j in range(len(s) - 2):
                # stable across processes: builtin hash() is salted by
                # PYTHONHASHSEED and made this test flaky run-to-run
                out[i, zlib.crc32(s[j:j + 3].encode()) % dim] += 1.0
        out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)
        return out

    for guard in (None, "same_source"):
        ents, gold = [], {}
        eid = 0
        for gi in range(8):
            first, last = firsts[gi], lasts[gi]
            for v in {f"{first} {last}", f"{first[0]}. {last}",
                      f"{first} {last}".upper()}:
                ents.append(Entity(
                    id=str(eid), name=v,
                    source="s0" if guard else f"s{eid % 3}",
                    type="PERSON"))
                gold[str(eid)] = gi
                eid += 1
        emb = ngram_embed([e.name for e in ents])
        idx = FlatIndex(64, "cosine", use_pallas=False, capacity=64)
        idx.insert(np.arange(len(ents)), emb)
        out = resolve_entities(ents, idx, k=8, dist_threshold=0.35,
                               jw_weight=0.6, type_guard=guard, seed=0)
        clusters = out["clusters"]
        assert set(clusters) == {e.id for e in ents}
        if guard == "same_source":
            by = {}
            for i, c in clusters.items():
                by.setdefault(c, []).append(i)
            assert all(len(m) == 1 for m in by.values())
        else:
            assert bcubed_f1(clusters, gold)["f1"] == 1.0
