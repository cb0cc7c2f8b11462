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


def test_vss_treatment_ef_sweep_records(tmp_path, rng):
    out = open(tmp_path / "v.jsonl", "w")
    REGISTRY["vss"](out, [300], rng)
    out.close()
    recs = [json.loads(l) for l in open(tmp_path / "v.jsonl")]
    engines = {r["permutation"]["engine"] for r in recs}
    assert engines == {"flat", "quantized", "hnsw"}
    qrec = next(r for r in recs if r["permutation"]["engine"] == "quantized")
    assert qrec["metrics"]["recall_at_k"] >= 0.9
    sweep = [r for r in recs if "ef" in r["permutation"]]
    assert {r["permutation"]["ef"] for r in sweep} == {10, 16, 32, 64, 128}
    for r in sweep:
        assert 0.0 <= r["metrics"]["recall_at_k"] <= 1.0
        assert r["metrics"]["query_qps"] > 0


def test_analyse_generates_charts_and_docs(tmp_path, rng):
    """analyse: JSONL -> plotly figure JSONs + rendered markdown pages
    (the reference's committed-charts pipeline role)."""
    from benchmarks.charts import analyse, build_charts, load_records

    out = open(tmp_path / "r.jsonl", "w")
    REGISTRY["vss"](out, [300], rng)
    REGISTRY["graph_traversal"](out, [200], rng)
    REGISTRY["graph_vt"](out, [200], rng)
    out.close()

    charts, docs = analyse(
        [tmp_path / "r.jsonl"],
        charts_dir=tmp_path / "charts", docs_dir=tmp_path / "docs",
    )
    names = {p.stem for p in charts}
    assert {"vss_recall", "vss_query_qps", "vss_build", "vss_recall_qps",
            "graph_traversal", "graph_vt_incremental"} <= names
    # every chart is a valid plotly figure: data traces + layout axes
    for p in charts:
        fig = json.loads(p.read_text())
        assert fig["data"] and "layout" in fig
        for tr in fig["data"]:
            assert len(tr["x"]) == len(tr["y"]) > 0
    # recall-QPS curve: recall ascending with ef, text labels carry ef
    fig = json.loads((tmp_path / "charts" / "vss_recall_qps.json").read_text())
    tr = fig["data"][0]
    assert tr["text"][0].startswith("ef=")
    # docs pages: index + one page per treatment with a table
    pages = {p.name for p in docs}
    assert {"index.md", "vss.md", "graph_traversal.md", "graph_vt.md"} <= pages
    vss_page = (tmp_path / "docs" / "vss.md").read_text()
    assert "| engine" in vss_page or "engine |" in vss_page
    assert "recall_at_k" in vss_page


def test_analyse_empty_and_partial_records(tmp_path):
    from benchmarks.charts import analyse

    (tmp_path / "empty.jsonl").write_text("")
    charts, docs = analyse(
        [tmp_path / "empty.jsonl"],
        charts_dir=tmp_path / "c", docs_dir=tmp_path / "d",
    )
    assert charts == []
    # index still written
    assert any(p.name == "index.md" for p in docs)
