"""Treatment runners emit valid records (mock-scale engines)."""

import numpy as np
import pytest

from benchmarks.harness import REGISTRY


def _run(name, params, rng):
    recs = []
    REGISTRY[name].run(
        params, rng, lambda p, m, w: recs.append((p, m, w))
    )
    return recs


def test_vss_flat_engine(rng):
    recs = _run(
        "vss",
        {"engine": "flat", "n": 300, "dim": 128, "k": 10,
         "queries": "heldout"},
        rng,
    )
    assert len(recs) == 1
    p, m, w = recs[0]
    assert m["recall_at_k"] == pytest.approx(1.0)
    assert m["query_qps"] > 0 and m["build_vec_per_s"] > 0


def test_vss_hnsw_emits_ef_sweep(rng):
    recs = _run(
        "vss",
        {"engine": "hnsw", "n": 300, "dim": 128, "k": 10,
         "queries": "heldout"},
        rng,
    )
    sweep = [r for r in recs if "ef" in r[0]]
    assert {r[0]["ef"] for r in sweep} == {10, 16, 32, 64, 128}
    for _, m, _ in recs:
        assert 0.0 <= m["recall_at_k"] <= 1.0


def test_vss_heldout_recall_beats_reference_floor(rng):
    """The reference-comparable (held-out) distribution: recall at
    default ef must clear the reference's published small-N curve
    (0.9884 @ 1k, BASELINE.md row 1)."""
    recs = _run(
        "vss",
        {"engine": "hnsw", "n": 1000, "dim": 128, "k": 10,
         "queries": "heldout"},
        rng,
    )
    base = next(m for p, m, _ in recs if "ef" not in p)
    assert base["recall_at_k"] >= 0.97


def test_vss_quantized_recall(rng):
    recs = _run(
        "vss",
        {"engine": "quantized", "n": 300, "dim": 128, "k": 10,
         "queries": "heldout"},
        rng,
    )
    assert recs[0][1]["recall_at_k"] >= 0.9


def test_graph_treatments_emit(rng):
    recs = _run("graph_traversal", {"n": 200, "avg_deg": 5}, rng)
    assert recs[0][1]["bfs_reached"] > 0
    recs = _run(
        "graph_centrality", {"n": 200, "avg_deg": 5, "bc_sources": 32}, rng
    )
    assert recs[0][1]["pagerank_ms"] > 0
    recs = _run("graph_vt", {"n": 200, "avg_deg": 5}, rng)
    assert recs[0][1]["incremental_ms"] < recs[0][1]["full_build_ms"] * 10


def test_kg_resolve_quality(rng):
    recs = _run("kg_resolve", {"n_entities": 300}, rng)
    m = recs[0][1]
    assert m["triple_merge_rate"] >= 0.9
    assert m["entities_per_s"] > 0


def test_graph_scale_refuses_cpu_fallback(rng, monkeypatch):
    """graph_scale must fail loudly when JAX resolved backend='cpu'
    (the axon-plugin-down fallback) instead of recording host timings
    as device rows — a real 1M-node 'device' row was once recorded on
    CPU this way."""
    monkeypatch.delenv("MUNINN_GRAPH_SCALE_ALLOW_CPU", raising=False)
    with pytest.raises(RuntimeError, match="cpu"):
        _run("graph_scale", {"n": 1500, "avg_deg": 6}, rng)


def test_graph_scale_treatment(rng, monkeypatch):
    """Device-resident scale treatment: device edge gen + device-sort
    CSR + array-mode analytics, tiny size on the CPU backend."""
    monkeypatch.setenv("MUNINN_GRAPH_SCALE_ALLOW_CPU", "1")
    recs = _run("graph_scale", {"n": 1500, "avg_deg": 6}, rng)
    assert len(recs) == 1
    p, m, w = recs[0]
    # honest stamp: on the CPU test backend the row must say "cpu" so
    # override runs can never masquerade as device measurements
    assert p["backend"] == "cpu"
    assert m["edges"] == 9000 and "error" not in m
    assert m["pagerank_sum"] == pytest.approx(1.0, abs=1e-3)
    assert m["bfs_reached"] > 1000  # ER at deg 6: giant component
    assert m["n_components"] >= 1
    assert all(m[k] > 0 for k in
               ("csr_build_s", "bfs_s", "pagerank20_s", "components_s"))
