"""Chart generation + benchmark doc rendering from harness JSONL.

The reference commits Plotly figure JSONs (``benchmarks/charts/*.json``)
and renders markdown benchmark pages (``docs/benchmarks/*.md``) from its
harness records (``benchmarks/harness/README.md:177-222``). Same here:

- ``analyse`` reads one or more JSONL files produced by
  ``python -m benchmarks.harness run --out results.jsonl``,
- writes Plotly-schema figure JSONs (plain dicts with ``data`` +
  ``layout`` — loadable by any Plotly runtime; no plotly dependency)
  under ``benchmarks/charts/``,
- renders per-treatment markdown pages with record tables under
  ``docs/benchmarks/``.

Usage:
    python -m benchmarks.harness analyse results.jsonl [--charts-dir D]
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

PALETTE = ["#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
           "#ff8ab7", "#a463f2", "#97bbf5"]



# The reference's published graph query times on erdos-renyi avg-deg-5
# graphs, ms (/root/reference/benchmarks/charts/graph_query_time_*.json;
# "muninn" = the sqlite-muninn engine itself, "graphqlite" = the faster
# comparator it benchmarks against). Overlaid dashed on our charts so
# every page carries the head-to-head.
REF_GRAPH_ER5 = {
    "pagerank_ms": {
        "reference muninn": ([100, 500, 1000, 5000, 10000, 50000],
                             [0.291, 3.407, 10.374, 221.624, 892.153, 79301.14]),
        "reference graphqlite": ([100, 500, 1000, 5000, 10000, 50000],
                                 [0.528, 1.275, 2.134, 8.169, 16.129, 169.6]),
    },
    "bfs_ms": {
        "reference muninn": ([100, 500, 1000, 5000, 10000, 50000],
                             [0.411, 1.885, 3.756, 19.83, 40.766, 857.576]),
        "reference graphqlite": ([100, 500, 1000, 5000, 10000, 50000],
                                 [0.251, 0.582, 1.003, 4.353, 8.471, 45.711]),
    },
    "components_ms": {
        "reference muninn": ([100, 500, 1000, 5000, 10000, 50000],
                             [0.264, 3.259, 12.383, 216.774, 877.759, 35990.114]),
        "reference graphqlite": ([100, 500, 1000, 5000, 10000, 50000],
                                 [3.014, 1.077, 1.944, 7.097, 14.018, 179.518]),
    },
    "shortest_path_ms": {
        "reference muninn": ([100, 500, 1000, 5000, 10000, 50000],
                             [0.175, 0.859, 2.091, 11.102, 23.385, 447.507]),
        "reference graphqlite": ([100, 500, 1000, 5000, 10000, 50000],
                                 [0.297, 0.573, 1.0, 4.288, 8.668, 69.471]),
    },
    # the reference's published betweenness/closeness are EXACT
    # all-source (its auto-approx threshold is 50k and the charts stop
    # at 10k) — overlaid on our exact series, not the sampled one
    "betweenness_exact_ms": {
        "reference muninn": ([100, 500, 1000, 5000, 10000],
                             [0.919, 13.493, 54.7, 1781.276, 5861.902]),
    },
    "leiden_ms": {
        "reference muninn": ([100, 500, 1000, 5000, 10000],
                             [0.323, 1.814, 40.173, 299.056, 1124.409]),
    },
    "dfs_ms": {
        "reference muninn": ([100, 500, 1000, 5000, 10000, 50000],
                             [0.381, 2.088, 4.245, 15.184, 26.813, 461.175]),
        "reference graphqlite": ([100, 500, 1000, 5000, 10000, 50000],
                                 [0.329, 0.623, 0.986, 4.313, 8.75, 72.95]),
    },
    "closeness_ms": {
        "reference muninn": ([100, 500, 1000, 5000, 10000],
                             [0.608, 12.299, 50.044, 1242.526, 5210.201]),
    },
}

# The reference's graph_vt shadow-table persistence numbers (ER-5;
# /root/reference/benchmarks/charts/graph_vt_{trigger,rebuild,disk}.json
# — its "CSR incremental" strategy, the closest analogue of
# GraphCache's delta + incremental path).
REF_GRAPH_VT = {
    "trigger_ms": ([500, 1000, 5000, 10000], [0.47, 1.463, 3.881, 6.128]),
    "rebuild_ms": ([500, 1000, 5000, 10000], [1.596, 1.373, 7.821, 18.292]),
    "disk_bytes": ([500, 1000, 5000, 10000],
                   [98304.0, 188416.0, 1486848.0, 2932736.0]),
}


def _ref_traces(metric: str, suffix: str = "") -> list:
    out = []
    for name, (x, y) in REF_GRAPH_ER5.get(metric, {}).items():
        out.append({"name": f"{name} {metric}{suffix}".strip(),
                    "x": list(x), "y": list(y),
                    "line": {"dash": "dot"}})
    return out


def load_records(paths) -> list[dict]:
    """Load JSONL records; one record per (treatment, permutation,
    backend) — the LATEST (by ts) wins, so re-runs supersede stale
    points instead of double-plotting on the charts.

    The backend is part of the identity (a cpu recall-curve re-run
    must not supersede — or pose as — a tpu throughput row of the same
    permutation), EXCEPT that legacy rows without a backend stamp are
    dropped entirely once any stamped re-measurement of the same
    permutation exists."""
    latest: dict = {}
    order: list = []
    stamped: set = set()
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                r = json.loads(line)
                base = (r.get("treatment"),
                        json.dumps(r.get("permutation"), sort_keys=True))
                if r.get("backend"):
                    stamped.add(base)
                key = (*base, r.get("backend"))
                prev = latest.get(key)
                if prev is None:
                    order.append(key)
                    latest[key] = r
                elif r.get("ts", 0) >= prev.get("ts", 0):
                    latest[key] = r
    return [latest[k] for k in order
            if k[2] is not None or k[:2] not in stamped]


def _fig(title: str, xtitle: str, ytitle: str, traces: list[dict],
         log_x: bool = False, log_y: bool = False) -> dict:
    for i, t in enumerate(traces):
        t.setdefault("type", "scatter")
        t.setdefault("mode", "lines+markers")
        t.setdefault("line", {"color": PALETTE[i % len(PALETTE)]})
    return {
        "data": traces,
        "layout": {
            "title": {"text": title},
            "xaxis": {"title": {"text": xtitle},
                      **({"type": "log"} if log_x else {})},
            "yaxis": {"title": {"text": ytitle},
                      **({"type": "log"} if log_y else {})},
            "template": "plotly_white",
        },
    }


def _series(recs, group_keys, x_key, y_key, split_backend=False):
    """Group records by permutation keys -> sorted (x, y) series.

    split_backend: throughput/time charts are HARDWARE statements —
    label each series with the recorded jax backend so cpu rows (e.g.
    recall-curve runs taken host-side) can't pose as tpu numbers. When
    False (quality/size metrics, backend-independent), duplicate x
    points across backends collapse to the latest-ts record.
    """
    groups = defaultdict(list)
    for r in recs:
        perm, met = r["permutation"], r["metrics"]
        if x_key not in perm or y_key not in met:
            continue
        gname = ",".join(f"{k}={perm[k]}" for k in group_keys if k in perm)
        if split_backend:
            be = r.get("backend")
            if be:
                gname = f"{gname},backend={be}" if gname else f"backend={be}"
        groups[gname].append((perm[x_key], r.get("ts", 0), met[y_key]))
    out = {}
    for g, pts in groups.items():
        if not split_backend:
            by_x = {}
            for x, ts, y in pts:
                if x not in by_x or ts >= by_x[x][0]:
                    by_x[x] = (ts, y)
            pts = [(x, ts, y) for x, (ts, y) in by_x.items()]
        pts.sort(key=lambda p: (p[0], p[1]))
        out[g] = ([p[0] for p in pts], [p[2] for p in pts])
    return out


def build_charts(recs: list[dict]) -> dict[str, dict]:
    """Returns chart-name -> plotly figure dict."""
    by_treatment = defaultdict(list)
    for r in recs:
        by_treatment[r["treatment"]].append(r)
    charts: dict[str, dict] = {}

    vss = by_treatment.get("vss", [])
    if vss:
        # group recall by engine AND query distribution: the held-out
        # series is the reference-comparable curve; ood is the stress
        # series (mixing them was round 2's recall artifact)
        base = [r for r in vss
                if "ef" not in r["permutation"]
                and "nprobe" not in r["permutation"]]
        sr = _series(base, ["engine", "dim", "queries"], "n", "recall_at_k")
        charts["vss_recall"] = _fig(
            "Recall@k vs corpus size", "N vectors", "recall@k",
            [{"name": g, "x": x, "y": y} for g, (x, y) in sr.items()],
            log_x=True,
        )
        # model-dim series vs the reference's published recall curves
        # (recall_models_ag_news.json — MiniLM 384-d / BGE-Large 1024-d
        # on AG News, darwin-arm64; BASELINE.md rows 1-2)
        REF_RECALL = {
            384: ([100, 1000, 5000, 10000, 50000, 100000],
                  [0.9986, 0.9884, 0.9722, 0.9598, 0.8812, 0.916],
                  "reference MiniLM-384 (CPU)"),
            1024: ([100, 5000, 50000],
                   [0.9982, 0.9733, 0.942],
                   "reference BGE-Large-1024 (CPU)"),
        }
        model_traces = []
        for dim, (rx, ry, rname) in REF_RECALL.items():
            ours = [r for r in base
                    if r["permutation"].get("dim") == dim
                    and r["permutation"].get("engine") == "hnsw"
                    and r["permutation"].get("queries") == "heldout"]
            if not ours:
                continue
            s = _series(ours, [], "n", "recall_at_k")
            for _, (x, y) in s.items():
                model_traces.append(
                    {"name": f"muninn-tpu hnsw {dim}-d", "x": x, "y": y})
            model_traces.append({"name": rname, "x": rx, "y": ry})
        if model_traces:
            charts["vss_recall_models"] = _fig(
                "Recall@10 vs reference published curves (model dims)",
                "N vectors", "recall@10", model_traces, log_x=True,
            )
        sq = _series(base, ["engine", "dim", "queries"], "n", "query_qps",
                     split_backend=True)
        charts["vss_query_qps"] = _fig(
            "Query throughput vs corpus size", "N vectors", "queries/s",
            [{"name": g, "x": x, "y": y} for g, (x, y) in sq.items()],
            log_x=True, log_y=True,
        )
        sb = _series(base, ["engine", "dim"], "n", "build_vec_per_s",
                     split_backend=True)
        charts["vss_build"] = _fig(
            "Build throughput vs corpus size", "N vectors", "vectors/s",
            [{"name": g, "x": x, "y": y} for g, (x, y) in sb.items()],
            log_x=True, log_y=True,
        )
        # persisted index bytes vs the reference's db_size chart
        # (db_size_models_ag_news.json, MiniLM-384 muninn-hnsw series)
        sd = _series(base, ["engine", "dim"], "n", "db_bytes")
        if sd:
            traces = [{"name": g, "x": x, "y": y}
                      for g, (x, y) in sd.items()]
            traces.append({
                "name": "reference muninn-hnsw MiniLM-384 (sqlite db)",
                "x": [100, 500, 1000, 5000, 10000, 50000, 100000],
                "y": [391617.6, 1938432.0, 4150298.3, 7963794.3,
                      15545958.4, 29234322.3, 331563008.0],
                "line": {"dash": "dot"},
            })
            charts["vss_db_size"] = _fig(
                "Persisted index size (dashed: reference published)",
                "N vectors", "bytes", traces, log_x=True, log_y=True,
            )
        # recall-QPS operating curves (hnsw ef sweep + ivf nprobe sweep,
        # one trace per N)
        sweep = [r for r in vss if r["permutation"].get("engine") == "hnsw"
                 and "ef" in r["permutation"]]
        if sweep:
            by_n = defaultdict(list)
            for r in sweep:
                perm = r["permutation"]
                key = (perm["n"], perm.get("dim", 128),
                       perm.get("queries", "heldout"),
                       r.get("backend") or "?")
                by_n[key].append(
                    (r["metrics"]["recall_at_k"], r["metrics"]["query_qps"],
                     perm["ef"])
                )
            traces = []
            for (n, dim, qdist, be), pts in sorted(by_n.items()):
                pts.sort()
                name = f"n={n}" + (f" {dim}-d" if dim != 128 else "")
                if qdist != "heldout":
                    name += f" ({qdist})"
                if be not in ("tpu", "?"):
                    name += f" [{be}]"
                traces.append({
                    "name": name,
                    "x": [p[0] for p in pts], "y": [p[1] for p in pts],
                    "text": [f"ef={p[2]}" for p in pts],
                })
            charts["vss_recall_qps"] = _fig(
                "HNSW recall-QPS operating curve (ef sweep)",
                "recall@k", "queries/s", traces, log_y=True,
            )
        psweep = [r for r in vss if r["permutation"].get("engine") == "ivf"
                  and "nprobe" in r["permutation"]]
        if psweep:
            by_n = defaultdict(list)
            for r in psweep:
                perm = r["permutation"]
                by_n[(perm["n"], r.get("backend") or "?")].append(
                    (r["metrics"]["recall_at_k"], r["metrics"]["query_qps"],
                     perm["nprobe"])
                )
            traces = []
            for (n, be), pts in sorted(by_n.items()):
                pts.sort()
                name = f"n={n}"
                if be not in ("tpu", "?"):
                    name += f" [{be}]"
                traces.append({
                    "name": name,
                    "x": [p[0] for p in pts], "y": [p[1] for p in pts],
                    "text": [f"nprobe={p[2]}" for p in pts],
                })
            charts["vss_ivf_recall_qps"] = _fig(
                "IVF recall-QPS operating curve (nprobe sweep)",
                "recall@k", "queries/s", traces, log_y=True,
            )

    vp = by_treatment.get("vss_params", [])
    if vp:
        sr = _series(vp, ["ef_construction"], "m", "recall_at_k")
        charts["vss_params_recall"] = _fig(
            "HNSW recall@10 vs M (ef_construction sweep, ef_search=64)",
            "M", "recall@10",
            [{"name": f"efC {g}", "x": x, "y": y} for g, (x, y) in sr.items()],
        )
        sb = _series(vp, ["ef_construction"], "m", "build_vec_per_s",
                     split_backend=True)
        charts["vss_params_build"] = _fig(
            "HNSW build rate vs M (ef_construction sweep)",
            "M", "vectors/s",
            [{"name": f"efC {g}", "x": x, "y": y} for g, (x, y) in sb.items()],
            log_y=True,
        )

    tr = by_treatment.get("graph_traversal", [])
    if tr:
        traces = []
        for metric in ("csr_build_ms", "bfs_ms", "dfs_ms", "components_ms",
                       "shortest_path_ms"):
            s = _series(tr, [], "n", metric)
            for _, (x, y) in s.items():
                traces.append({"name": metric, "x": x, "y": y})
        for m_ in ("bfs_ms", "dfs_ms", "components_ms", "shortest_path_ms"):
            traces += _ref_traces(m_)
        charts["graph_traversal"] = _fig(
            "Graph traversal times (dashed: reference published, ER-5)",
            "N nodes", "ms", traces,
            log_x=True, log_y=True,
        )

    ct = by_treatment.get("graph_centrality", [])
    if ct:
        traces = []
        for metric in ("pagerank_ms", "betweenness_ms",
                       "betweenness_exact_ms", "degree_ms",
                       "closeness_ms"):
            s = _series(ct, [], "n", metric)
            for _, (x, y) in s.items():
                traces.append({"name": metric, "x": x, "y": y})
        traces += (_ref_traces("pagerank_ms")
                   + _ref_traces("betweenness_exact_ms")
                   + _ref_traces("closeness_ms"))
        charts["graph_centrality"] = _fig(
            "Centrality times (dashed: reference published, ER-5)",
            "N nodes", "ms", traces,
            log_x=True, log_y=True,
        )

    cm = by_treatment.get("graph_community", [])
    if cm:
        s = _series(cm, [], "n", "leiden_ms")
        q = _series(cm, [], "n", "modularity")
        traces = [{"name": "leiden_ms", "x": x, "y": y} for _, (x, y) in s.items()]
        traces += [{"name": "modularity", "x": x, "y": y, "yaxis": "y2"}
                   for _, (x, y) in q.items()]
        traces += _ref_traces("leiden_ms")
        fig = _fig("Leiden time + modularity (dashed: reference published)",
                   "N nodes", "ms", traces, log_x=True)
        fig["layout"]["yaxis2"] = {
            "title": {"text": "modularity"}, "overlaying": "y", "side": "right",
        }
        charts["graph_community"] = fig

    gs = by_treatment.get("graph_scale", [])
    if gs:
        traces = []
        for metric in ("csr_build_s", "bfs_s", "pagerank20_s",
                       "components_s"):
            s = _series(gs, [], "n", metric)
            for _, (x, y) in s.items():
                traces.append({"name": metric, "x": x, "y": y})
        charts["graph_scale"] = _fig(
            "Device-resident graph ops at scale (avg degree 10)",
            "N nodes", "seconds", traces, log_x=True, log_y=True,
        )

    gv = by_treatment.get("graph_vt", [])
    if gv:
        traces = []
        for metric in ("full_build_ms", "incremental_ms", "trigger_ms",
                       "rebuild_ms", "save_ms"):
            s = _series(gv, [], "n", metric)
            for _, (x, y) in s.items():
                traces.append({"name": metric, "x": x, "y": y})
        for m_ in ("trigger_ms", "rebuild_ms"):
            if m_ in REF_GRAPH_VT:
                rx, ry = REF_GRAPH_VT[m_]
                traces.append({
                    "name": f"reference muninn {m_} (CSR incremental)",
                    "x": list(rx), "y": list(ry), "line": {"dash": "dot"},
                })
        charts["graph_vt_incremental"] = _fig(
            "CSR cache: build / delta append (trigger role) / incremental"
            " vs full rebuild / save (dashed: reference published)",
            "N nodes", "ms", traces, log_x=True, log_y=True,
        )
        s = _series(gv, [], "n", "disk_bytes")
        traces = [{"name": "disk_bytes (GraphCache.save)", "x": x, "y": y}
                  for _, (x, y) in s.items()]
        rx, ry = REF_GRAPH_VT["disk_bytes"]
        traces.append({"name": "reference muninn disk_bytes (CSR)",
                       "x": list(rx), "y": list(ry),
                       "line": {"dash": "dot"}})
        charts["graph_vt_disk"] = _fig(
            "CSR cache persisted size (dashed: reference published)",
            "N nodes", "bytes", traces, log_x=True, log_y=True,
        )
    return charts



def _head_to_head(by_treatment) -> list[str]:
    """Index-page summary table: our measured time at every point the
    reference published one (ER-5 curves; reference's own 'muninn'
    engine), with the speedup factor."""
    metric_of = {
        "pagerank_ms": ("graph_centrality", "pagerank_ms"),
        "bfs_ms": ("graph_traversal", "bfs_ms"),
        "components_ms": ("graph_traversal", "components_ms"),
        "shortest_path_ms": ("graph_traversal", "shortest_path_ms"),
        "betweenness_exact_ms": ("graph_centrality", "betweenness_exact_ms"),
        "leiden_ms": ("graph_community", "leiden_ms"),
        "dfs_ms": ("graph_traversal", "dfs_ms"),
        "closeness_ms": ("graph_centrality", "closeness_ms"),
    }
    lines = ["## Head-to-head vs the reference's published numbers", "",
             "Reference = sqlite-muninn's own engine on erdos-renyi",
             "avg-deg-5 graphs (its committed charts). Ours = this repo's",
             "measured rows at the same N (host fast path). Machines",
             "differ: reference numbers are from its author's",
             "darwin-arm64; ours from this repo's linux-x86_64 vCPU —",
             "and every row still clears 1x on the slower-single-core",
             "machine. [same_machine.md](same_machine.md) re-times the",
             "reference engine HERE for the hard apples-to-apples page.",
             "",
             "| op | N | reference ms | ours ms | speedup |",
             "|---|---|---|---|---|"]
    n_rows = 0
    for metric, (treatment, mkey) in metric_of.items():
        ref = REF_GRAPH_ER5.get(metric, {}).get("reference muninn")
        if ref is None:
            continue
        ours = {}
        for r in by_treatment.get(treatment, []):
            n = r["permutation"].get("n")
            v = r["metrics"].get(mkey)
            if n is not None and v is not None:
                ours[n] = v  # latest wins (records pre-deduped upstream)
        for n, rv in zip(*ref):
            if n in ours and ours[n] > 0:
                lines.append(
                    f"| {mkey[:-3]} | {n} | {rv:.4g} | {ours[n]:.4g} | "
                    f"{rv / ours[n]:.1f}x |")
                n_rows += 1
    return lines if n_rows else []


def render_docs(recs: list[dict], charts: dict[str, dict],
                docs_dir: Path) -> list[Path]:
    """One markdown page per treatment: record table + chart links."""
    docs_dir.mkdir(parents=True, exist_ok=True)
    by_treatment = defaultdict(list)
    for r in recs:
        by_treatment[r["treatment"]].append(r)
    written = []
    index_lines = ["# Benchmarks", "",
                   "Generated by `python -m benchmarks.harness analyse`.", ""]
    if (docs_dir / "same_machine.md").exists():
        index_lines += [
            "**[Same-machine head-to-head](same_machine.md)** — the",
            "reference engine compiled and timed on THIS machine next to",
            "ours, identical graphs and parameters (cross-machine ratios",
            "below are soft in both directions; that page is not).", "",
        ]
    h2h = _head_to_head(by_treatment)
    if h2h:
        index_lines += h2h + [""]
    for name, rows in sorted(by_treatment.items()):
        perm_keys = sorted({k for r in rows for k in r["permutation"]})
        met_keys = sorted({k for r in rows for k in r["metrics"]})
        lines = [f"# {name}", ""]
        rel_charts = [c for c in charts if c.startswith(name.split("_")[0])]
        for c in rel_charts:
            lines.append(f"- chart: [`{c}.json`](../../benchmarks/charts/{c}.json)")
        if rel_charts:
            lines.append("")
        header = perm_keys + met_keys + ["wall_s", "platform", "device"]
        lines.append("| " + " | ".join(header) + " |")
        lines.append("|" + "---|" * len(header))

        def _permkey(r):
            # type-ranked tuples: a key can be numeric in one row and a
            # string (or absent) in another — raw mixing breaks sorted()
            def cell(k):
                v = r["permutation"].get(k)
                if v is None:
                    return (0, 0.0, "")
                if isinstance(v, (int, float)):
                    return (1, float(v), "")
                return (2, 0.0, str(v))
            return tuple(cell(k) for k in perm_keys)

        rows = sorted(rows, key=_permkey)
        for r in rows:
            cells = [str(r["permutation"].get(k, "")) for k in perm_keys]
            cells += [
                (f"{v:.4g}" if isinstance(v, float) else str(v))
                for v in (r["metrics"].get(k, "") for k in met_keys)
            ]
            cells += [f"{r['wall_s']:.3g}", r.get("platform", ""),
                      r.get("backend", "") or ""]
            lines.append("| " + " | ".join(cells) + " |")
        page = docs_dir / f"{name}.md"
        page.write_text("\n".join(lines) + "\n")
        written.append(page)
        index_lines.append(f"- [{name}]({name}.md) — {len(rows)} records")
    idx = docs_dir / "index.md"
    idx.write_text("\n".join(index_lines) + "\n")
    written.append(idx)
    return written


def check_same_machine_gate(
    path="benchmarks/results/same_machine.jsonl",
) -> list[str]:
    """The every-row-wins invariant (round-4 VERDICT task #10): every
    gated row of the same-machine head-to-head must have speedup >= 1x
    (or a reference timeout). Returns violations; empty = pass."""
    p = Path(path)
    if not p.is_absolute() and not p.exists():
        p = Path(__file__).resolve().parent.parent / path
    if not p.exists():
        return []
    from benchmarks.ref_same_machine import check_all_rows_win

    rows = [json.loads(ln) for ln in p.read_text().splitlines() if ln]
    # the file is latest-per-(op, n) after compaction, but dedupe again
    # defensively so a stale appended file can't hide behind old rows
    latest: dict = {}
    for r in rows:
        key = (r["op"], r["n"])
        if key not in latest or r.get("ts", 0) >= latest[key].get("ts", 0):
            latest[key] = r
    return check_all_rows_win(list(latest.values()))


def analyse(jsonl_paths, charts_dir="benchmarks/charts",
            docs_dir="docs/benchmarks") -> tuple[list[Path], list[Path]]:
    recs = load_records(jsonl_paths)
    charts = build_charts(recs)
    cdir = Path(charts_dir)
    cdir.mkdir(parents=True, exist_ok=True)
    chart_paths = []
    for name, fig in charts.items():
        p = cdir / f"{name}.json"
        p.write_text(json.dumps(fig, indent=1))
        chart_paths.append(p)
    doc_paths = render_docs(recs, charts, Path(docs_dir))
    bad = check_same_machine_gate()
    if bad:
        raise SystemExit(
            "same-machine rows below 1x (every-row-wins invariant, "
            "VERDICT r4 #10): " + "; ".join(bad)
        )
    return chart_paths, doc_paths
