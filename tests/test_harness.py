"""Benchmark harness smoke: treatments run and emit valid records."""

import json

import numpy as np

from benchmarks.harness import REGISTRY, Record, _clustered


def test_registry_has_all_treatments():
    assert {"vss", "graph_traversal", "graph_centrality",
            "graph_community", "graph_vt", "node2vec"} <= set(REGISTRY)


def test_graph_treatments_emit_records(tmp_path, rng):
    out = open(tmp_path / "r.jsonl", "w")
    REGISTRY["graph_vt"](out, [200], rng)
    REGISTRY["graph_community"](out, [200], rng)
    out.close()
    lines = [json.loads(l) for l in open(tmp_path / "r.jsonl")]
    assert len(lines) == 2
    for rec in lines:
        assert {"treatment", "permutation", "metrics", "wall_s",
                "peak_rss_mb", "platform", "ts"} <= set(rec)


def test_clustered_data_unit_norm(rng):
    x = _clustered(rng, 100, 16)
    np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, rtol=1e-5)
