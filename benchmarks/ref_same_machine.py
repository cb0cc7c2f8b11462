"""Same-machine head-to-head vs the reference's own engine.

The reference's committed chart numbers were produced on its author's
darwin-arm64 machine; this repo's rows come from a linux-x86_64 vCPU.
Cross-machine ratios are therefore soft in BOTH directions. This tool
removes the variable: it compiles the reference SQLite extension from
``/root/reference/src`` (graph + HNSW subsystems, ``MUNINN_NO_LLAMA``)
on THIS machine and times its graph TVFs next to muninn-tpu's host
engine on identical graphs with identical parameters (the reference's
own treatment queries: BFS/DFS forward max_depth=1000 per-query,
PageRank damping=0.85 iterations=100, betweenness/closeness
direction='both' with its default exact-below-50k policy, Leiden
defaults — ``/root/reference/benchmarks/harness/treatments/*.py``).

Usage:
    python -m benchmarks.ref_same_machine [--sizes 100,1000,...] \
        [--out benchmarks/results/same_machine.jsonl]

Writes JSONL rows and renders ``docs/benchmarks/same_machine.md``.
NOTE: single-core machine — run with nothing else active (see
DEVELOPMENT.md "Single-core measurement discipline").
"""

from __future__ import annotations

import argparse
import json
import sqlite3
import subprocess
import time
from pathlib import Path

REF_SRC = Path("/root/reference/src")
BUILD_DIR = Path("/tmp/refbuild")
SO_PATH = BUILD_DIR / "muninn.so"  # basename fixes the sqlite entry point
DEFAULT_SIZES = (100, 1000, 2000, 5000, 10000)
PER_OP_TIMEOUT_S = 300.0


def build_reference() -> Path | None:
    """Compile the reference extension (same -O3 -march=native as our
    native runtime so neither side gets a compiler edge)."""
    if not REF_SRC.exists():
        return None
    BUILD_DIR.mkdir(exist_ok=True)
    srcs = [
        p for p in sorted(REF_SRC.glob("*.c"))
        if not p.name.startswith(("llama_", "sqlite3_wasm"))
    ]
    if SO_PATH.exists() and SO_PATH.stat().st_mtime > max(
        p.stat().st_mtime for p in srcs
    ):
        return SO_PATH
    cmd = [
        "gcc", "-O3", "-march=native", "-std=gnu11", "-shared", "-fPIC",
        "-DMUNINN_NO_LLAMA", f"-I{REF_SRC}", "-o", str(SO_PATH),
        *map(str, srcs), "-lm",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except Exception:
        return None
    return SO_PATH


def _ref_conn(src, dst) -> sqlite3.Connection:
    con = sqlite3.connect(":memory:")
    con.enable_load_extension(True)
    con.load_extension(str(SO_PATH.with_suffix("")))
    con.execute("CREATE TABLE edges(src INTEGER, dst INTEGER)")
    con.execute("CREATE INDEX idx_src ON edges(src)")
    con.execute("CREATE INDEX idx_dst ON edges(dst)")
    con.executemany(
        "INSERT INTO edges VALUES (?, ?)",
        zip(src.tolist(), dst.tolist()),
    )
    con.commit()
    return con


def _timed(fn, budget_s: float = 0.6, max_reps: int = 5) -> float:
    """Warm-median timing, same discipline as the harness treatments."""
    times = []
    while len(times) < max_reps:
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        if sum(times) >= budget_s:
            break
    times.sort()
    return times[len(times) // 2]


def _guarded(con: sqlite3.Connection, fn):
    """Run fn with a progress-handler timeout; returns seconds or None
    (the reference engine has no other interruption point)."""
    deadline = time.time() + PER_OP_TIMEOUT_S
    con.set_progress_handler(
        lambda: 1 if time.time() > deadline else 0, 1_000_000
    )
    try:
        return _timed(fn)
    except sqlite3.OperationalError:
        return None
    finally:
        con.set_progress_handler(None, 0)


def run(sizes, out_path: Path, docs_path: Path | None) -> list[dict]:
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    from muninn_tpu.graph import Graph

    so = build_reference()
    if so is None:
        raise SystemExit("reference build failed (gcc or /root/reference missing)")

    BASE = "edge_table = 'edges' AND src_col = 'src' AND dst_col = 'dst'"
    rows: list[dict] = []
    for n in sizes:
        rng = np.random.default_rng(1234)
        e = n * 5
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        starts = rng.integers(0, n, 10).tolist()
        ends = rng.integers(0, n, 10).tolist()
        con = _ref_conn(src, dst)
        g = Graph.from_edges(src.tolist(), dst.tolist())
        g.host_csr("forward")  # parity: the ref has its edge table indexed

        def per_query(fn, items):
            def one():
                for it in items:
                    fn(it)
            t = _timed(one)
            return None if t is None else t / len(items)

        ref_ops = {
            "bfs": lambda: [con.execute(
                f"SELECT node, depth FROM graph_bfs WHERE {BASE}"
                " AND start_node = ? AND max_depth = 1000"
                " AND direction = 'forward'", (str(s),)).fetchall()
                for s in starts],
            "dfs": lambda: [con.execute(
                f"SELECT node, depth FROM graph_dfs WHERE {BASE}"
                " AND start_node = ? AND max_depth = 1000"
                " AND direction = 'forward'", (str(s),)).fetchall()
                for s in starts],
            "shortest_path": lambda: [con.execute(
                "SELECT node, distance, path_order FROM graph_shortest_path"
                f" WHERE {BASE} AND start_node = ? AND end_node = ?",
                (str(a), str(b))).fetchall()
                for a, b in zip(starts, ends)],
            "components": lambda: con.execute(
                f"SELECT node, component_id FROM graph_components WHERE {BASE}"
            ).fetchall(),
            "pagerank": lambda: con.execute(
                f"SELECT node, rank FROM graph_pagerank WHERE {BASE}"
                " AND damping = 0.85 AND iterations = 100").fetchall(),
            "betweenness": lambda: con.execute(
                "SELECT node, centrality FROM graph_node_betweenness"
                f" WHERE {BASE} AND direction = 'both'").fetchall(),
            "closeness": lambda: con.execute(
                "SELECT node, centrality FROM graph_closeness"
                f" WHERE {BASE} AND direction = 'both'").fetchall(),
            "leiden": lambda: con.execute(
                "SELECT node, community_id, modularity FROM graph_leiden"
                f" WHERE {BASE}").fetchall(),
        }
        our_ops = {
            "bfs": lambda: [g.bfs(int(s), max_depth=1000) for s in starts],
            "dfs": lambda: [g.dfs(int(s), max_depth=1000) for s in starts],
            "shortest_path": lambda: [
                g.shortest_path(int(a), int(b))
                for a, b in zip(starts, ends)],
            "components": g.connected_components,
            "pagerank": lambda: g.pagerank(0.85, 100),
            # exact below the reference's 50k auto-approx threshold,
            # like its default (both engines sample sqrt(N) above it)
            "betweenness": lambda: g.betweenness(direction="both"),
            "closeness": lambda: g.closeness(),
            "leiden": lambda: g.leiden(seed=0),
        }
        per_q = {"bfs", "dfs", "shortest_path"}
        for op, rfn in ref_ops.items():
            ref_s = _guarded(con, rfn)
            ours_s = _timed(our_ops[op])
            if ref_s is not None and op in per_q:
                ref_s /= len(starts)
            if op in per_q:
                ours_s /= len(starts)
            row = {
                "n": int(n), "edges": int(e), "op": op,
                "ref_ms": None if ref_s is None else round(ref_s * 1e3, 4),
                "ref_timeout": ref_s is None,
                "ours_ms": round(ours_s * 1e3, 4),
                "speedup": (
                    None if ref_s is None else round(ref_s / ours_s, 2)
                ),
                "ts": time.time(),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        con.close()
        rows += _vt_section(n, src, dst)
        if n <= 2000:
            rows += _node2vec_section(n, src, dst)

    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if docs_path is not None:
        render_docs(rows, docs_path)
    return rows


def _node2vec_section(n: int, src, dst) -> list[dict]:
    """node2vec head-to-head (reference treatment role,
    ``benchmarks/harness/treatments/node2vec.py``): identical moderate
    parameters on both engines — dim=64, p=q=1, num_walks=10,
    walk_length=40, window=5, neg=5, lr=0.025, epochs=3 — both writing
    their embeddings into their own vector index (the reference's
    node2vec_train contract always writes an hnsw_index table; ours
    gets an ``output_index`` HnswIndex). One timed run each (seconds-
    scale op). Gated to n <= 2000: the reference's own treatment tier
    stops at 1000 nodes."""
    import numpy as np

    from muninn_tpu.graph import Graph
    from muninn_tpu.index.hnsw import HnswIndex
    from muninn_tpu.models.node2vec import node2vec_train

    rows: list[dict] = []
    e = len(src)
    params = dict(num_walks=10, walk_length=40, window=5,
                  neg_samples=5, learning_rate=0.025, epochs=3)
    dim = 64

    con = _ref_conn(src, dst)
    ref_s = None
    try:
        con.execute(
            f"CREATE VIRTUAL TABLE n2v USING hnsw_index("
            f"dimensions={dim}, metric='cosine')"
        )
        t0 = time.perf_counter()
        con.execute(
            "SELECT node2vec_train('edges', 'src', 'dst', 'n2v', "
            f"{dim}, 1.0, 1.0, {params['num_walks']}, "
            f"{params['walk_length']}, {params['window']}, "
            f"{params['neg_samples']}, {params['learning_rate']}, "
            f"{params['epochs']})"
        ).fetchall()
        ref_s = time.perf_counter() - t0
    except sqlite3.OperationalError:
        ref_s = None
    finally:
        con.close()

    g = Graph.from_edges(src.tolist(), dst.tolist())
    # warm run first: the index-write path jit-compiles once per shape
    # bucket; every other row on this page is a warm median, and the
    # reference's C is precompiled — cold XLA compile time is not the
    # engine. The timed run trains + writes into a FRESH index.
    node2vec_train(g, dim=dim, p=1.0, q=1.0, seed=1,
                   output_index=HnswIndex(dim, "cosine"), **params)
    out = HnswIndex(dim, "cosine")
    t0 = time.perf_counter()
    node2vec_train(g, dim=dim, p=1.0, q=1.0, seed=1,
                   output_index=out, **params)
    ours_s = time.perf_counter() - t0
    assert len(out) == g.num_nodes

    row = {
        "n": int(n), "edges": int(e), "op": "node2vec",
        "ref_ms": None if ref_s is None else round(ref_s * 1e3, 4),
        "ref_timeout": ref_s is None,
        "ours_ms": round(ours_s * 1e3, 4),
        "speedup": None if ref_s is None else round(ref_s / ours_s, 2),
        "ts": time.time(),
    }
    rows.append(row)
    print(json.dumps(row), flush=True)
    return rows


def _vt_section(n: int, src, dst) -> list[dict]:
    """Adjacency-cache head-to-head: the reference's graph_adjacency
    vtab (shadow tables + AFTER-INSERT triggers, file-backed for disk
    measurement) vs GraphCache (block files + delta log). Same delta
    sizes as the reference's graph_vt treatment (max(10, E/100))."""
    import shutil
    import tempfile
    import os

    from muninn_tpu.graph.adjacency import GraphCache

    e = len(src)
    n_delta = max(10, e // 100)
    rng2 = __import__("numpy").random.default_rng(99)
    dsrc = rng2.integers(0, n, n_delta)
    ddst = rng2.integers(0, n, n_delta)
    rows: list[dict] = []

    def row(op, ref_s, ours_s, unit="ms"):
        scale = 1e3 if unit == "ms" else 1.0
        r = {
            "n": int(n), "edges": int(e), "op": op,
            "ref_ms": None if ref_s is None else round(ref_s * scale, 4),
            "ref_timeout": ref_s is None,
            "ours_ms": round(ours_s * scale, 4),
            "speedup": None if ref_s is None or ours_s == 0
            else round(ref_s / ours_s, 2),
            "ts": time.time(),
        }
        rows.append(r)
        print(json.dumps(r), flush=True)

    tmp = tempfile.mkdtemp(prefix="muninn_sm_")
    try:
        db = os.path.join(tmp, "ref.db")
        con = sqlite3.connect(db)
        con.enable_load_extension(True)
        con.load_extension(str(SO_PATH.with_suffix("")))
        con.execute("CREATE TABLE edges(src INTEGER, dst INTEGER, weight REAL)")
        con.executemany(
            "INSERT INTO edges VALUES (?, ?, 1.0)",
            zip(src.tolist(), dst.tolist()),
        )
        con.commit()
        con.execute("VACUUM")
        base_bytes = os.path.getsize(db)
        t0 = time.perf_counter()
        con.execute(
            "CREATE VIRTUAL TABLE g USING graph_adjacency("
            "edge_table='edges', src_col='src', dst_col='dst',"
            " weight_col='weight')"
        )
        list(con.execute("SELECT count(*) FROM g"))  # force build
        ref_build = time.perf_counter() - t0
        # trigger overhead: the delta INSERT with triggers installed
        t0 = time.perf_counter()
        con.executemany(
            "INSERT INTO edges VALUES (?, ?, 1.0)",
            zip(dsrc.tolist(), ddst.tolist()),
        )
        con.commit()
        ref_trig = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute("INSERT INTO g(g) VALUES('incremental_rebuild')")
        con.commit()
        ref_inc = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute("INSERT INTO g(g) VALUES('rebuild')")
        con.commit()
        ref_reb = time.perf_counter() - t0
        con.execute("VACUUM")
        con.commit()
        ref_disk = os.path.getsize(db) - base_bytes
        con.close()

        # Graph construction and rebuilds are LAZY here (device CSR /
        # host mirrors build on first use) — force the host CSRs the
        # reference's shadow tables hold so both sides do real work
        def _force(graph):
            graph.host_csr("forward")
            graph.host_csr("reverse")

        t0 = time.perf_counter()
        gc = GraphCache.from_edges(src.tolist(), dst.tolist())
        _force(gc.graph())
        our_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        gc.add_edges(dsrc.tolist(), ddst.tolist())
        our_trig = time.perf_counter() - t0
        t0 = time.perf_counter()
        _force(gc.graph())
        our_inc = time.perf_counter() - t0
        t0 = time.perf_counter()
        gc.rebuild()
        _force(gc.graph())
        our_reb = time.perf_counter() - t0
        sdir = os.path.join(tmp, "ours")
        gc.save(sdir)
        our_disk = sum(
            p.stat().st_size for p in Path(sdir).rglob("*") if p.is_file()
        )
        row("vt_build", ref_build, our_build)
        row("vt_trigger", ref_trig, our_trig)
        row("vt_incremental", ref_inc, our_inc)
        row("vt_rebuild", ref_reb, our_reb)
        row("vt_disk_bytes", float(max(ref_disk, 0)), float(our_disk),
            unit="bytes")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return rows


def _vss_data(n: int, dim: int, nq: int):
    """bench.py's exact data family (1000 clusters, 0.3 noise, 0.05
    query perturbation), host-side bits + exact recall@10 GT."""
    import numpy as np

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((1000, dim)).astype(np.float32)
    x = centers[rng.integers(0, 1000, n)] + 0.3 * rng.standard_normal(
        (n, dim)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.integers(0, n, nq)] + 0.05 * rng.standard_normal(
        (nq, dim)
    ).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sims = q @ x.T
    gt = np.argpartition(-sims, 10, axis=1)[:, :10]
    # exact order within the partition
    order = np.argsort(-np.take_along_axis(sims, gt, axis=1), axis=1)
    gt = np.take_along_axis(gt, order, axis=1)
    return x, q, gt


def _ref_vss(n: int, dim: int, x, q, gt) -> dict | None:
    """Reference HNSW vtab at its own treatment parameters
    (``/root/reference/benchmarks/harness/treatments/vss.py``: M=16,
    ef_construction=200, ef_search=64, cosine, recall@10)."""
    if build_reference() is None:
        return None
    con = sqlite3.connect(":memory:")
    con.enable_load_extension(True)
    con.load_extension(str(SO_PATH.with_suffix("")))
    con.execute(
        f"CREATE VIRTUAL TABLE v USING hnsw_index("
        f"dimensions={dim}, metric=cosine, m=16, ef_construction=200)"
    )
    t0 = time.perf_counter()
    con.executemany(
        "INSERT INTO v(rowid, vector) VALUES (?, ?)",
        ((i, x[i].tobytes()) for i in range(n)),
    )
    con.commit()
    ins_s = time.perf_counter() - t0
    con.execute(
        "SELECT rowid FROM v WHERE vector MATCH ? AND k = 10"
        " AND ef_search = 64", (q[0].tobytes(),)).fetchall()  # warm
    t0 = time.perf_counter()
    got = [
        [r[0] for r in con.execute(
            "SELECT rowid FROM v WHERE vector MATCH ? AND k = 10"
            " AND ef_search = 64", (q[i].tobytes(),)).fetchall()]
        for i in range(len(q))
    ]
    query_s = time.perf_counter() - t0
    con.close()
    hits = sum(len(set(g) & set(t.tolist())) for g, t in zip(got, gt))
    return {
        "insert_s": ins_s, "insert_vec_per_s": n / ins_s,
        "query_ms": query_s * 1e3 / len(q),
        "recall_at_10": hits / (len(q) * 10.0),
    }


def _ours_vss_tpu(n: int, dim: int, nq: int, data_npz: str | None,
                  attempts: int = 3) -> dict | None:
    """Our engine on the TPU attached to this machine, via a fresh
    subprocess per attempt (the axon tunnel is single-client and needs
    process-level retries on plugin-discovery failures — CLAUDE.md)."""
    import os
    import subprocess
    import sys as _sys

    cmd = [_sys.executable, "-m", "benchmarks.vss_ours",
           str(n), str(dim), "--ef", "64", "--nq", str(nq)]
    if data_npz:
        cmd += ["--data", data_npz]
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    for _ in range(attempts):
        try:
            p = subprocess.run(
                cmd, capture_output=True, text=True, timeout=2400,
                cwd=Path(__file__).resolve().parent.parent, env=env,
            )
        except subprocess.TimeoutExpired:
            continue
        for line in reversed(p.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("op") == "vss_ours":
                return rec
        time.sleep(20)
    return None


def vss_section(sizes=(1000, 10_000, 50_000, 100_000), dim: int = 384,
                nq: int = 1024) -> list[dict]:
    """Head-to-head on the reference's OWN headline workload (vector
    search, ``treatments/vss.py`` role): its HNSW vtab compiled and run
    on this machine vs our engine on this machine's TPU — insert rate,
    per-query latency at matched parameters, recall@10 vs exact GT.
    At n <= 10k our side runs on BIT-IDENTICAL data (uploaded through
    the tunnel, untimed); larger tiers generate device-side from the
    same family (uploading 150 MB at ~2 MB/s would time the tunnel).

    Host-engine context rows (our CPU fallback path on identical bits)
    are recorded with ``gated: false``: the host path trades latency
    for batch throughput + recall and is not the serving engine — the
    published claim is engine vs engine on this machine.
    """
    import tempfile

    import numpy as np

    rows: list[dict] = []

    def row(op, n, ref_s, ours_s, *, gated=True, **extra):
        r = {
            "n": int(n), "edges": 0, "op": op,
            "ref_ms": None if ref_s is None else round(ref_s * 1e3, 4),
            "ref_timeout": ref_s is None,
            "ours_ms": None if ours_s is None else round(ours_s * 1e3, 4),
            "speedup": (
                None if ref_s is None or not ours_s
                else round(ref_s / ours_s, 2)
            ),
            "gated": gated, "ts": time.time(), **extra,
        }
        rows.append(r)
        print(json.dumps(r), flush=True)

    for n in sizes:
        x, q, gt = _vss_data(n, dim, nq)
        ref = _ref_vss(n, dim, x, q, gt)
        data_npz = None
        if n <= 10_000:
            f = tempfile.NamedTemporaryFile(suffix=".npz", delete=False)
            np.savez(f.name, x=x, q=q)
            data_npz = f.name
        ours = _ours_vss_tpu(n, dim, nq, data_npz)
        if ours is None:
            print(f"vss n={n}: TPU side unavailable, skipping tier",
                  flush=True)
            continue
        if ref is None:
            print(f"vss n={n}: reference build failed", flush=True)
            continue
        row("vss_insert", n, ref["insert_s"], ours["build_ms"] / 1e3,
            ref_vec_per_s=round(ref["insert_vec_per_s"], 1),
            ours_vec_per_s=ours["build_vec_per_s"],
            ours_cold_vec_per_s=ours["build_cold_vec_per_s"])
        row("vss_query", n, ref["query_ms"] / 1e3, ours["query_ms"] / 1e3,
            ref_recall=round(ref["recall_at_10"], 4),
            ours_recall=ours["recall_at_10"],
            nq=nq, data=ours["data"],
            engine_qps_batch=ours["engine_qps_batch"],
            engine_batch=ours["engine_batch"],
            engine_recall=ours["engine_recall_at_10"])

        # host-engine context (identical bits; not the serving engine)
        if n <= 10_000:
            import jax

            jax.config.update("jax_platforms", "cpu")
            from muninn_tpu.index.hnsw import HnswIndex

            t0 = time.perf_counter()
            hidx = HnswIndex(dim, "cosine", m=16, ef_construction=200)
            hidx.insert(np.arange(n), x)
            h_build = time.perf_counter() - t0
            hidx.search(q, k=10, ef_search=64)  # warm
            t0 = time.perf_counter()
            hids, _ = hidx.search(q, k=10, ef_search=64)
            h_query = time.perf_counter() - t0
            hrec = sum(
                len(set(a.tolist()) & set(b.tolist()))
                for a, b in zip(np.asarray(hids), gt)
            ) / (len(q) * 10.0)
            row("vss_insert_hostcpu", n, ref["insert_s"], h_build,
                gated=False, ours_vec_per_s=round(n / h_build, 1))
            row("vss_query_hostcpu", n, ref["query_ms"] / 1e3,
                h_query / len(q), gated=False,
                ref_recall=round(ref["recall_at_10"], 4),
                ours_recall=round(hrec, 4))
    return rows


def compact_results(out_path: Path,
                    archive_dir: Path | None = None) -> list[dict]:
    """Latest-per-(op, n) compaction (round-4 VERDICT task #10): the
    appended history moves to ``archive/``, the main JSONL keeps only
    the newest row per (op, n) so no consumer needs to dedupe. Returns
    the kept rows."""
    if not out_path.exists():
        return []
    rows = [json.loads(ln) for ln in out_path.read_text().splitlines() if ln]
    if archive_dir is None:
        archive_dir = out_path.parent / "archive"
    archive_dir.mkdir(parents=True, exist_ok=True)
    with open(archive_dir / f"{out_path.stem}_history.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    latest: dict = {}
    for r in rows:                       # file order; ts breaks ties
        key = (r["op"], r["n"])
        if key not in latest or r.get("ts", 0) >= latest[key].get("ts", 0):
            latest[key] = r
    kept = sorted(latest.values(), key=lambda r: (r["op"], r["n"]))
    with open(out_path, "w") as f:
        for r in kept:
            f.write(json.dumps(r) + "\n")
    return kept


def check_all_rows_win(rows: list[dict]) -> list[str]:
    """The CI-checked invariant behind the published 'every row wins'
    claim: every GATED row's speedup is >= 1x (or the reference timed
    out). Returns violation strings (empty = pass)."""
    bad = []
    for r in rows:
        if not r.get("gated", True):
            continue
        sp = r.get("speedup")
        if r.get("ref_timeout"):
            continue
        if sp is None or sp < 1.0:
            bad.append(f"{r['op']} @ n={r['n']}: speedup={sp}")
    return bad


def hnsw_section(n: int = 10_000, dim: int = 384) -> dict:
    """Reference HNSW vtab measured on THIS machine (insert rate,
    query latency, recall@10 at its published defaults M=16 efC=200
    efS=64 cosine) — grounds bench.py's vs_baseline ratios: the
    published 2,439 QPS / 148 vec/s came from the author's faster
    darwin-arm64 core. Our engine's numbers for the same workload are
    TPU-side (BENCH_r*.json), not re-run here."""
    import numpy as np

    if build_reference() is None:
        raise SystemExit("reference build failed")
    # bench.py's exact distribution (1000 clusters, 0.3 noise, 0.05
    # query perturbation) so this row is directly comparable to the
    # TPU engine's recorded recall on the same data family
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((1000, dim)).astype(np.float32)
    x = centers[rng.integers(0, 1000, n)] + 0.3 * rng.standard_normal(
        (n, dim)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.integers(0, n, 100)] + 0.05 * rng.standard_normal(
        (100, dim)
    ).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sims = q @ x.T
    gt = np.argsort(-sims, axis=1)[:, :10]

    con = sqlite3.connect(":memory:")
    con.enable_load_extension(True)
    con.load_extension(str(SO_PATH.with_suffix("")))
    con.execute(
        f"CREATE VIRTUAL TABLE v USING hnsw_index("
        f"dimensions={dim}, metric=cosine, m=16, ef_construction=200)"
    )
    t0 = time.perf_counter()
    con.executemany(
        "INSERT INTO v(rowid, vector) VALUES (?, ?)",
        ((i, x[i].tobytes()) for i in range(n)),
    )
    con.commit()
    ins_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = [
        [r[0] for r in con.execute(
            "SELECT rowid FROM v WHERE vector MATCH ? AND k = 10"
            " AND ef_search = 64", (q[i].tobytes(),)).fetchall()]
        for i in range(100)
    ]
    query_s = time.perf_counter() - t0
    hits = sum(len(set(g) & set(t.tolist())) for g, t in zip(got, gt))
    out = {
        "n": n, "dim": dim,
        "insert_vec_per_s": round(n / ins_s, 1),
        "query_ms": round(query_s * 10.0, 4),  # /100 queries, ms
        "query_qps": round(100 / query_s, 1),
        "recall_at_10": round(hits / 1000.0, 4),
    }
    print(json.dumps({"op": "ref_hnsw_this_machine", **out}), flush=True)
    con.close()
    return out


def render_docs(rows: list[dict], path: Path) -> None:
    graph_rows = [r for r in rows if not r["op"].startswith("vss")]
    vss_rows = [r for r in rows if r["op"].startswith("vss")]
    lines = [
        "# Same-machine head-to-head",
        "",
        "The reference extension (`/root/reference/src`, graph + HNSW",
        "subsystems, `-O3 -march=native`, its own default parameters via",
        "its own treatment queries) vs muninn-tpu — BOTH on",
        "this machine, same graphs (ER avg-deg-5, seed 1234), same",
        "parameters. Generated by `python -m benchmarks.ref_same_machine`.",
        "",
        "bfs / dfs / shortest_path are per-query ms (10 queries);",
        "PageRank is 100 iterations (the reference treatment's setting).",
        "vt_* rows are the adjacency-cache surface (reference",
        "graph_adjacency vtab with real triggers vs GraphCache);",
        "vt_disk_bytes values are bytes, not ms.",
        "",
        "| op | N | reference ms | ours ms | speedup |",
        "|---|---|---|---|---|",
    ]
    for r in graph_rows:
        ref = "timeout" if r["ref_timeout"] else f"{r['ref_ms']:.4g}"
        sp = "—" if r["speedup"] is None else f"{r['speedup']:.1f}x"
        lines.append(
            f"| {r['op']} | {r['n']} | {ref} | {r['ours_ms']:.4g} | {sp} |"
        )
    if vss_rows:
        lines += [
            "",
            "## Vector search (vss): reference HNSW vtab vs our engine",
            "",
            "The reference's headline workload at its own treatment",
            "parameters (M=16, ef_construction=200, ef_search=64, cosine,",
            "recall@10 vs exact ground truth; 384-d clustered unit",
            "vectors, bench.py's generator family). Reference runs on",
            "this machine's CPU; ours is THE ENGINE — the TPU attached to",
            "this machine (n <= 10k tiers use bit-identical uploaded",
            "data; larger tiers generate device-side from the same",
            "family). `vss_insert` is total build wall, `vss_query` is",
            "per-query ms over the same query set (ours: one batched",
            "dispatch — the contract every client surface exposes).",
            "`*_hostcpu` context rows are our CPU fallback path on",
            "identical bits: not the serving engine, reported for",
            "completeness, excluded from the every-row-wins gate.",
            "",
            "| op | N | reference ms | ours ms | speedup |"
            " ref recall | ours recall |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in vss_rows:
            ref = "timeout" if r["ref_timeout"] else f"{r['ref_ms']:.4g}"
            sp = "—" if r["speedup"] is None else f"{r['speedup']:.1f}x"
            rr = r.get("ref_recall")
            orc = r.get("ours_recall")
            lines.append(
                f"| {r['op']} | {r['n']} | {ref} | {r['ours_ms']:.4g} |"
                f" {sp} | {rr if rr is not None else '—'} |"
                f" {orc if orc is not None else '—'} |"
            )
        eng = [r for r in vss_rows if r.get("engine_qps_batch")]
        if eng:
            lines += ["", "Engine-batch operating point (same index, "
                          "same ef):", ""]
            for r in eng:
                lines.append(
                    f"- n={r['n']}: **{r['engine_qps_batch']:,.0f} QPS** at"
                    f" batch {r['engine_batch']}, recall@10"
                    f" {r['engine_recall']}"
                )
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default=",".join(map(str, DEFAULT_SIZES)))
    ap.add_argument("--out", default="benchmarks/results/same_machine.jsonl")
    ap.add_argument("--docs", default="docs/benchmarks/same_machine.md")
    ap.add_argument("--hnsw", action="store_true",
                    help="also measure the reference HNSW vtab here "
                         "(~2 min; appends to the docs page)")
    ap.add_argument("--vss", action="store_true",
                    help="vector-search head-to-head: reference HNSW "
                         "vtab (host) vs our engine (this machine's "
                         "TPU) — needs the tunnel; ~30-60 min")
    ap.add_argument("--vss-sizes", default="1000,10000,50000,100000")
    ap.add_argument("--skip-graph", action="store_true",
                    help="skip the graph sections (vss-only run)")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",") if s]
    out = Path(args.out)
    docs = Path(args.docs)
    if not args.skip_graph:
        run(sizes, out, None)
    if args.vss:
        vrows = vss_section(
            tuple(int(s) for s in args.vss_sizes.split(",") if s)
        )
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "a") as f:
            for r in vrows:
                f.write(json.dumps(r) + "\n")
    kept = compact_results(out)
    render_docs(kept, docs)
    bad = check_all_rows_win(kept)
    if bad:
        raise SystemExit(
            "gated rows below 1x (every-row-wins invariant): "
            + "; ".join(bad)
        )
    if args.hnsw:
        h = hnsw_section()
        with open(docs, "a") as f:
            f.write(
                "\n## Reference HNSW on this machine\n\n"
                f"Its published defaults (M=16, efC=200, efS=64, cosine),"
                f" {h['n']} x {h['dim']}-d clustered unit vectors:\n\n"
                f"- insert: **{h['insert_vec_per_s']} vec/s**"
                " (published darwin-arm64: ~148-206 vec/s)\n"
                f"- query: **{h['query_ms']} ms/query"
                f" = {h['query_qps']} QPS** at recall@10 ="
                f" {h['recall_at_10']} (published: 0.41-3.07 ms)\n\n"
                "Our engine's numbers for this workload are TPU-side"
                " (BENCH_r*.json: 52k+ QPS @ recall 0.98, 3k+ vec/s"
                " bulk build at 100k x 384) — the vs_baseline ratios in"
                " bench.py divide by the published darwin numbers,"
                " which this machine's reference build does not reach.\n"
            )


if __name__ == "__main__":
    main()
