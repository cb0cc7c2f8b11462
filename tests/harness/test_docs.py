"""Rendered benchmark doc pages (reference ``test_docs.py`` role):
per-treatment markdown tables, chart links, index listing."""

import json

from benchmarks.charts import analyse, build_charts, render_docs
from benchmarks.harness import REGISTRY
from benchmarks.harness.core import emit_for


def _records(tmp_path, rng):
    p = tmp_path / "r.jsonl"
    with open(p, "w") as out:
        for name, params in [
            ("vss", {"engine": "flat", "n": 300, "dim": 128, "k": 10,
                     "queries": "heldout"}),
            ("graph_community", {"n": 250, "avg_deg": 8}),
        ]:
            REGISTRY[name].run(params, rng, emit_for(name, out))
    return [json.loads(l) for l in p.read_text().splitlines()]


def test_doc_pages_are_valid_markdown_tables(tmp_path, rng, capsys):
    recs = _records(tmp_path, rng)
    capsys.readouterr()
    charts = build_charts(recs)
    docs = render_docs(recs, charts, tmp_path / "docs")
    by_name = {p.name: p for p in docs}
    assert {"vss.md", "graph_community.md", "index.md"} <= set(by_name)

    page = by_name["vss.md"].read_text().splitlines()
    assert page[0] == "# vss"
    header = next(l for l in page if l.startswith("| "))
    cols = [c.strip() for c in header.strip("|").split("|")]
    # permutation keys then metric keys then wall/platform/device
    assert cols[-3:] == ["wall_s", "platform", "device"]
    assert "engine" in cols and "recall_at_k" in cols
    sep = page[page.index(header) + 1]
    assert set(sep) <= {"|", "-"}
    body = [l for l in page[page.index(header) + 2:] if l.startswith("|")]
    assert body and all(l.count("|") == header.count("|") for l in body)

    # chart links resolve to names build_charts produced
    linked = [l for l in page if l.startswith("- chart:")]
    for l in linked:
        cname = l.split("`")[1].removesuffix(".json")
        assert cname in charts


def test_index_counts_records(tmp_path, rng, capsys):
    recs = _records(tmp_path, rng)
    capsys.readouterr()
    docs = render_docs(recs, {}, tmp_path / "docs")
    idx = next(p for p in docs if p.name == "index.md").read_text()
    assert "[graph_community](graph_community.md)" in idx
    n_vss = sum(r["treatment"] == "vss" for r in recs)
    assert f"[vss](vss.md) — {n_vss} records" in idx


def test_analyse_writes_charts_then_docs(tmp_path, rng, capsys):
    _records(tmp_path, rng)
    capsys.readouterr()
    charts, docs = analyse(
        [tmp_path / "r.jsonl"],
        charts_dir=tmp_path / "charts", docs_dir=tmp_path / "docs",
    )
    # every chart the docs link to exists on disk as valid plotly JSON
    for p in charts:
        fig = json.loads(p.read_text())
        assert "data" in fig and "layout" in fig
    for page in docs:
        for line in page.read_text().splitlines():
            if line.startswith("- chart:"):
                cname = line.split("`")[1]
                assert (tmp_path / "charts" / cname).exists()


def test_committed_docs_match_committed_charts():
    """The repo's committed docs/benchmarks pages must not reference
    chart JSONs that don't exist in benchmarks/charts (drift guard)."""
    from pathlib import Path

    charts_dir = Path("benchmarks/charts")
    for page in Path("docs/benchmarks").glob("*.md"):
        for line in page.read_text().splitlines():
            if line.startswith("- chart:"):
                cname = line.split("`")[1]
                assert (charts_dir / cname).exists(), f"{page}: {cname}"
