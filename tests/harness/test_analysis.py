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
