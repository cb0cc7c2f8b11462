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
    'Hldgs' variants of each base name (exact-match + JW/cosine tiers)
    AND keep distinct bases apart — B-Cubed/pairwise F1 vs the
    generator's known clusters (round-4 VERDICT task #8: the old
    triple-merge oracle alone scored 1.0 while precision was 0.07)."""
    recs = _run("kg_resolve", {"n_entities": 150}, rng)
    _, m, _ = recs[0]
    assert m["triple_merge_rate"] >= 0.9
    assert m["bcubed_f1"] >= 0.95, m
    assert m["pairwise_f1"] >= 0.9, m
    assert m["bcubed_precision"] >= 0.9, m
    np.testing.assert_allclose(m["entities_per_s"] > 0, True)


def test_kg_resolve_quality_holds_at_density(rng):
    """The 3k tier (entropy-scaled names, TF-IDF blocking): quality
    must not collapse as the corpus gets dense — the round-4 failure
    mode was blocker crowding by the corpus-wide 'Holdings' token."""
    recs = _run("kg_resolve", {"n_entities": 3000}, rng)
    _, m, _ = recs[0]
    assert m["triple_merge_rate"] >= 0.98, m
    assert m["bcubed_f1"] >= 0.98, m


def test_tfidf_blocking_ranks_rare_token_variant_first(rng):
    """Unit contract for the TF-IDF embedder: the abbreviated variant
    (shares the RARE tokens) must out-rank a distractor sharing only
    corpus-wide tokens — the bag-of-words model ranks them the other
    way around at scale."""
    from muninn_tpu.models.embed import TfidfHashEmbedModel

    corpus = ["Yamsevgar Quaqua Holdings", "Yamsevgar Quaqua Hldgs",
              "Nimgarwik Quaqua Holdings", "Telvinmak Corzor Holdings",
              "Boltrosev Dexplu Holdings"] + [
        f"Filler{i} Name{i} Holdings" for i in range(40)
    ]
    m = TfidfHashEmbedModel(dim=96, ngram=3).fit(corpus)
    v = m.embed(corpus[:3])
    base, variant, distractor = v[0], v[1], v[2]
    assert base @ variant > base @ distractor
    # embeddings normalized + deterministic
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(m.embed(corpus[:1])[0], base, atol=1e-6)


def test_kg_re_treatment_scores_triples(rng):
    recs = _run("kg_re", {"n_docs": 30, "backend": "echo"}, rng)
    _, m, _ = recs[0]
    # the echo backend extracts exactly the 'X <verb> Y' pattern the
    # gold docs embed, so the quality gate is tight
    assert m["triple_f1"] >= 0.95
    assert m["triple_precision"] >= 0.95 and m["triple_recall"] >= 0.95
    assert m["docs_per_s"] > 0
