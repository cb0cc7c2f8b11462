"""Text/KG + embed + node2vec treatment runners (reference
``test_embed_treatment.py`` / ``test_kg_*`` roles) — deterministic
hash/echo backends, mock scale."""

import numpy as np

from benchmarks.harness import REGISTRY


def _run(name, params, rng):
    recs = []
    REGISTRY[name].run(params, rng, lambda p, m, w: recs.append((p, m, w)))
    return recs


def test_embed_treatment(rng):
    recs = _run("embed", {"n_texts": 200, "dim": 64, "backend": "hash"}, rng)
    assert len(recs) == 1
    _, m, w = recs[0]
    assert m["texts_per_s"] > 0 and m["unit_norm"] is True
    assert w > 0


def test_kg_extract_treatment(rng):
    recs = _run("kg_extract", {"n_docs": 40, "backend": "echo"}, rng)
    _, m, _ = recs[0]
    # the echo backend extracts exactly the gold capitalized spans
    assert m["entity_f1"] >= 0.95
    assert m["entity_precision"] >= 0.95 and m["entity_recall"] >= 0.95
    assert m["relations"] >= 40
    assert m["docs_per_s"] > 0


def test_kg_graphrag_treatment(rng):
    recs = _run("kg_graphrag", {"n_docs": 30}, rng)
    _, m, _ = recs[0]
    assert m["communities"] >= 1
    assert 0.0 <= m["modularity"] <= 1.0
    assert m["labeled"] == m["communities"]
    assert m["retrieved"] == 5  # k=5 hits against the entity index


def test_node2vec_treatment(rng):
    recs = _run("node2vec", {"n": 300, "dim": 16}, rng)
    _, m, _ = recs[0]
    assert m["nodes_per_s"] > 0 and m["train_s"] > 0


def test_node2vec_grid_caps_n():
    grid = REGISTRY["node2vec"].grid([1000, 50_000])
    assert all(p["n"] <= 2000 for p in grid)


def test_kg_resolve_merges_case_and_abbrev_variants(rng):
    """Quality contract at mock scale: the cascade must merge UPPER and
    'Hldgs' variants of each base name (exact-match + JW/cosine tiers)."""
    recs = _run("kg_resolve", {"n_entities": 150}, rng)
    _, m, _ = recs[0]
    assert m["triple_merge_rate"] >= 0.9
    np.testing.assert_allclose(m["entities_per_s"] > 0, True)


def test_kg_re_treatment_scores_triples(rng):
    recs = _run("kg_re", {"n_docs": 30, "backend": "echo"}, rng)
    _, m, _ = recs[0]
    # the echo backend extracts exactly the 'X <verb> Y' pattern the
    # gold docs embed, so the quality gate is tight
    assert m["triple_f1"] >= 0.95
    assert m["triple_precision"] >= 0.95 and m["triple_recall"] >= 0.95
    assert m["docs_per_s"] > 0
