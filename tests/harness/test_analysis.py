"""analyse stage: JSONL -> plotly chart JSONs + rendered doc pages."""

import json

from benchmarks.harness import REGISTRY
from benchmarks.harness.core import emit_for


def _emit_jsonl(path, names_params, rng):
    with open(path, "w") as out:
        for name, params in names_params:
            REGISTRY[name].run(params, rng, emit_for(name, out))


def test_analyse_generates_charts_and_docs(tmp_path, rng, capsys):
    _emit_jsonl(
        tmp_path / "r.jsonl",
        [
            ("vss", {"engine": "flat", "n": 300, "dim": 128, "k": 10,
                     "queries": "heldout"}),
            ("vss", {"engine": "hnsw", "n": 300, "dim": 128, "k": 10,
                     "queries": "heldout"}),
            ("graph_traversal", {"n": 200, "avg_deg": 5}),
            ("graph_vt", {"n": 200, "avg_deg": 5}),
        ],
        rng,
    )
    capsys.readouterr()
    from benchmarks.charts import analyse

    charts, docs = analyse(
        [tmp_path / "r.jsonl"],
        charts_dir=tmp_path / "charts", docs_dir=tmp_path / "docs",
    )
    names = {p.stem for p in charts}
    assert {"vss_recall", "vss_query_qps", "vss_build", "vss_recall_qps",
            "graph_traversal", "graph_vt_incremental"} <= names
    for p in charts:
        fig = json.loads(p.read_text())
        assert fig["data"] and "layout" in fig
        for tr in fig["data"]:
            assert len(tr["x"]) == len(tr["y"]) > 0
    fig = json.loads((tmp_path / "charts" / "vss_recall_qps.json").read_text())
    assert fig["data"][0]["text"][0].startswith("ef=")
    pages = {p.name for p in docs}
    assert {"index.md", "vss.md", "graph_traversal.md", "graph_vt.md"} <= pages
    vss_page = (tmp_path / "docs" / "vss.md").read_text()
    assert "recall_at_k" in vss_page


def test_analyse_empty_and_partial_records(tmp_path):
    from benchmarks.charts import analyse

    (tmp_path / "empty.jsonl").write_text("")
    charts, docs = analyse(
        [tmp_path / "empty.jsonl"],
        charts_dir=tmp_path / "c", docs_dir=tmp_path / "d",
    )
    assert charts == []
    assert any(p.name == "index.md" for p in docs)


def test_recall_chart_separates_query_distributions(tmp_path, rng, capsys):
    """heldout and ood hnsw series must not be mixed into one curve."""
    _emit_jsonl(
        tmp_path / "r.jsonl",
        [
            ("vss", {"engine": "hnsw", "n": 300, "dim": 128, "k": 10,
                     "queries": "heldout"}),
            ("vss", {"engine": "hnsw", "n": 300, "dim": 128, "k": 10,
                     "queries": "ood"}),
        ],
        rng,
    )
    capsys.readouterr()
    from benchmarks.charts import build_charts, load_records

    charts = build_charts(load_records([tmp_path / "r.jsonl"]))
    names = {t["name"] for t in charts["vss_recall"]["data"]}
    assert any("queries=heldout" in n for n in names)
    assert any("queries=ood" in n for n in names)


def _rec(treatment, perm, metrics, ts, backend=None):
    r = {"treatment": treatment, "permutation": perm, "metrics": metrics,
         "wall_s": 0.1, "peak_rss_mb": 1.0, "platform": "test", "ts": ts}
    if backend is not None:
        r["backend"] = backend
    return r


def test_load_records_backend_identity(tmp_path):
    """cpu and tpu rows of the same permutation coexist; stamped rows
    supersede legacy unstamped rows of the same permutation; within a
    backend the latest ts wins."""
    from benchmarks.charts import load_records

    perm = {"engine": "hnsw", "n": 100, "dim": 128, "k": 10,
            "queries": "heldout"}
    rows = [
        _rec("vss", perm, {"query_qps": 1.0}, ts=1),              # legacy
        _rec("vss", perm, {"query_qps": 2.0}, ts=2, backend="cpu"),
        _rec("vss", perm, {"query_qps": 3.0}, ts=3, backend="tpu"),
        _rec("vss", perm, {"query_qps": 4.0}, ts=4, backend="tpu"),
    ]
    p = tmp_path / "r.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    recs = load_records([p])
    got = {(r.get("backend"), r["metrics"]["query_qps"]) for r in recs}
    assert got == {("cpu", 2.0), ("tpu", 4.0)}  # legacy row dropped

    # a legacy row with NO stamped re-measurement survives
    perm2 = dict(perm, n=200)
    p2 = tmp_path / "r2.jsonl"
    p2.write_text(json.dumps(_rec("vss", perm2, {"query_qps": 9.0}, ts=1)))
    recs = load_records([p, p2])
    assert any(r["permutation"].get("n") == 200 for r in recs)


def test_throughput_charts_split_by_backend(tmp_path):
    """QPS/build series are hardware statements: cpu rows get their own
    labeled trace instead of posing as (or superseding) tpu numbers.
    Recall series stay backend-merged (latest wins per x)."""
    from benchmarks.charts import build_charts, load_records

    perm = {"engine": "hnsw", "n": 100, "dim": 128, "k": 10,
            "queries": "heldout"}
    rows = [
        _rec("vss", perm,
             {"query_qps": 50.0, "recall_at_k": 0.99,
              "build_vec_per_s": 10.0}, ts=1, backend="cpu"),
        _rec("vss", perm,
             {"query_qps": 5000.0, "recall_at_k": 0.99,
              "build_vec_per_s": 100.0}, ts=2, backend="tpu"),
    ]
    p = tmp_path / "r.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    charts = build_charts(load_records([p]))

    qps_names = {t["name"] for t in charts["vss_query_qps"]["data"]}
    assert any("backend=cpu" in n for n in qps_names)
    assert any("backend=tpu" in n for n in qps_names)
    build_names = {t["name"] for t in charts["vss_build"]["data"]}
    assert any("backend=cpu" in n for n in build_names)

    # recall chart: one merged series, single point (latest ts wins)
    rec_traces = [t for t in charts["vss_recall"]["data"]]
    assert all("backend" not in t["name"] for t in rec_traces)
    assert all(len(t["x"]) == 1 for t in rec_traces)
