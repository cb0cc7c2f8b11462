"""GraphCache randomized churn differential soak.

Random interleavings of add_edges / remove_edges / lazy reads /
explicit rebuild() / incremental_rebuild() / save+load, checked after
every read against an in-order list oracle implementing the
reference's sequential replay semantics (a delete removes the FIRST
live matching (src, dst) occurrence; deletes of nonexistent edges are
no-ops — ``src/graph_csr.c:219-247``). Exercises every branch the
fixed unit test can't reach in one shot:

- net-delta cancellation (same-batch insert+delete pairs),
- mirror-driven COO deletes (no replay scan),
- new-node fallback to full rebuild mid-stream,
- capacity-overflow fallback,
- parallel duplicate edges + repeated deletes,
- device-CSR patch vs from-scratch build bit-identity,
- block-granular save()/load() with tiny BLOCK_EDGES so multi-block
  dirty tracking runs, repeated saves to the same directory,
- crash recovery: DeltaLog-attached trials drop the live instance
  mid-churn and recover from last save + log replay (the reference's
  shadow-table redo role, ``src/graph_adjacency.c``), then keep
  churning on the RECOVERED instance.
"""
import sys
import tempfile
import time
import traceback
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from muninn_tpu.graph.adjacency import GraphCache
from muninn_tpu.graph.api import Graph


def oracle_apply(edges, batch):
    """Sequential replay over a list of (src, dst, w) ext-id triples."""
    for rec in batch:
        if rec["op"] == "insert":
            edges.append((rec["src"], rec["dst"], float(rec.get("w", 1.0))))
        else:
            for i, (s, d, _) in enumerate(edges):
                if s == rec["src"] and d == rec["dst"]:
                    del edges[i]
                    break


def gc_edges(gc):
    """GraphCache's COO as ext-id triples, in storage order."""
    ids = gc.nodes.ids
    return [
        (ids[s], ids[d], float(w))
        for s, d, w in zip(gc._src.tolist(), gc._dst.tolist(), gc._w.tolist())
    ]


def check_equal(gc, edges, tag):
    gc.graph()  # any read triggers _ensure_fresh (lazy mode relies on it)
    got = gc_edges(gc)
    assert got == edges, (
        f"{tag}: COO diverged\n got[:8]={got[:8]}\nwant[:8]={edges[:8]}\n"
        f"lens {len(got)} vs {len(edges)}"
    )


def check_csr(gc, edges, tag):
    """Device CSR after churn must bit-equal a from-scratch build over
    the oracle edge list (same interning order = same dense ids)."""
    g = gc.graph()
    if not edges:
        return
    # fresh graph over the SAME node table ordering: intern in gc order
    ref = Graph.from_edges(
        [e[0] for e in edges], [e[1] for e in edges],
        [e[2] for e in edges] if gc.weighted else None,
    )
    for direction in ("forward", "reverse"):
        c = g.csr(direction)
        r = ref.csr(direction)
        # node sets may intern in different orders if deletes removed
        # all edges of early nodes — map through ext ids
        gi = {n: i for i, n in enumerate(gc.nodes.ids)}
        off_g = np.asarray(c.offsets)
        off_r = np.asarray(r.offsets)
        sg, dg = np.asarray(c.src), np.asarray(c.dst)
        wg = np.asarray(c.weights)
        sr, dr = np.asarray(r.src), np.asarray(r.dst)
        wr = np.asarray(r.weights)
        rids = ref.nodes.ids
        for n in rids:
            a, b = gi[n], rids.index(n)
            lo_g, hi_g = int(off_g[a]), int(off_g[a + 1])
            lo_r, hi_r = int(off_r[b]), int(off_r[b + 1])
            assert hi_g - lo_g == hi_r - lo_r, (
                f"{tag}: {direction} degree({n!r}) "
                f"{hi_g - lo_g} != {hi_r - lo_r}"
            )
            got = [
                (gc.nodes.ids[dg[i]], float(wg[i])) for i in range(lo_g, hi_g)
            ]
            want = [(rids[dr[i]], float(wr[i])) for i in range(lo_r, hi_r)]
            assert got == want, (
                f"{tag}: {direction} row {n!r} diverged: {got} vs {want}"
            )
        # nodes in gc but absent from ref (every edge deleted) must have
        # empty rows
        extra = set(gc.nodes.ids) - set(rids)
        for n in extra:
            a = gi[n]
            assert int(off_g[a + 1]) == int(off_g[a]), (
                f"{tag}: {direction} dangling node {n!r} has edges"
            )


def check_degrees(gc, edges, tag):
    want_out, want_in = {}, {}
    for s, d, _ in edges:
        want_out[s] = want_out.get(s, 0) + 1
        want_in[d] = want_in.get(d, 0) + 1
    got = gc.degrees()
    for n, (ind, outd, _, _) in got.items():
        assert ind == want_in.get(n, 0), f"{tag}: in-degree({n!r})"
        assert outd == want_out.get(n, 0), f"{tag}: out-degree({n!r})"


def run_trial(trial: int, rng: np.random.Generator) -> None:
    weighted = bool(rng.integers(0, 2))
    use_str_ids = bool(rng.integers(0, 2))
    with_log = bool(rng.integers(0, 2))
    n0 = int(rng.integers(0, 120))
    n_pool = n0 + 40

    def ident(i):
        return f"n{i}" if use_str_ids else int(i)

    edges: list[tuple] = []
    log_path = (
        tempfile.mktemp(prefix="gc_churn_log_") if with_log else None
    )
    gc = GraphCache(weighted=weighted, log_path=log_path)
    gc.BLOCK_EDGES = 64  # tiny blocks: multi-block save paths run
    if n0:
        s0 = rng.integers(0, n0, n0 * 2)
        d0 = rng.integers(0, n0, n0 * 2)
        w0 = (
            rng.uniform(0.5, 2.0, n0 * 2).astype(np.float32)
            if weighted else np.ones(n0 * 2, np.float32)
        )
        batch = [
            {"op": "insert", "src": ident(a), "dst": ident(b), "w": float(w)}
            for a, b, w in zip(s0.tolist(), d0.tolist(), w0.tolist())
        ]
        gc.add_edges(
            [r["src"] for r in batch], [r["dst"] for r in batch],
            [r["w"] for r in batch] if weighted else None,
        )
        oracle_apply(edges, batch)
        gc.graph()  # settle generation 1

    save_dir = None
    for phase in range(int(rng.integers(4, 9))):
        # sometimes materialize device CSRs so the incremental patch
        # path has something to patch
        if rng.random() < 0.6 and gc.num_edges:
            g = gc.graph()
            if rng.random() < 0.5:
                g.csr("forward")
            if rng.random() < 0.5:
                g.csr("reverse")
        batch = []
        nb = int(rng.integers(1, 30))
        for _ in range(nb):
            roll = rng.random()
            if roll < 0.45 or not edges:
                hi = n_pool if rng.random() < 0.15 else n0 + 5
                a, b = int(rng.integers(0, max(hi, 1))), int(
                    rng.integers(0, max(hi, 1))
                )
                w = float(np.float32(rng.uniform(0.5, 2.0))) if weighted else 1.0
                batch.append(
                    {"op": "insert", "src": ident(a), "dst": ident(b), "w": w}
                )
            elif roll < 0.85:
                s, d, _ = edges[int(rng.integers(0, len(edges)))]
                batch.append({"op": "delete", "src": s, "dst": d})
            elif roll < 0.93 and batch:
                # delete an edge inserted earlier in THIS batch
                cands = [r for r in batch if r["op"] == "insert"]
                if cands:
                    r = cands[int(rng.integers(0, len(cands)))]
                    batch.append(
                        {"op": "delete", "src": r["src"], "dst": r["dst"]}
                    )
            else:
                # delete a (probably) nonexistent edge
                batch.append(
                    {
                        "op": "delete",
                        "src": ident(int(rng.integers(0, n_pool))),
                        "dst": ident(int(rng.integers(0, n_pool))),
                    }
                )
        ins = [r for r in batch if r["op"] == "insert"]
        # interleave in gc API order: adds then removes per sub-batch,
        # matching oracle order by splitting into runs
        run, runs = [batch[0]], []
        for r in batch[1:]:
            if r["op"] == run[-1]["op"]:
                run.append(r)
            else:
                runs.append(run)
                run = [r]
        runs.append(run)
        for run in runs:
            if run[0]["op"] == "insert":
                gc.add_edges(
                    [r["src"] for r in run], [r["dst"] for r in run],
                    [r["w"] for r in run] if weighted else None,
                )
            else:
                gc.remove_edges(
                    [r["src"] for r in run], [r["dst"] for r in run]
                )
        oracle_apply(edges, batch)

        mode = rng.random()
        tag = (
            f"trial={trial} phase={phase} weighted={weighted} "
            f"str={use_str_ids} nb={nb} n_ins={len(ins)} mode={mode:.2f}"
        )
        if mode < 0.35:
            gc.incremental_rebuild()
        elif mode < 0.55:
            gc.rebuild()
        # else: lazy — the next read triggers _ensure_fresh
        check_equal(gc, edges, tag)
        if rng.random() < 0.5:
            check_degrees(gc, edges, tag)
        if rng.random() < 0.45:
            check_csr(gc, edges, tag)
        if rng.random() < 0.35:
            if save_dir is None:
                save_dir = tempfile.mkdtemp(prefix="gc_churn_")
            gc.save(save_dir)
            gc2 = GraphCache.load(save_dir)
            check_equal(gc2, edges, tag + " [reload]")
        elif with_log and save_dir is not None and rng.random() < 0.4:
            # CRASH: drop the live instance; recover = last save + log
            # replay (save() clears the log, so the log holds exactly
            # the mutations since), then keep churning on the
            # recovered instance
            del gc
            gc = GraphCache.load(save_dir, log_path=log_path)
            check_equal(gc, edges, tag + " [crash-recover]")
            gc.BLOCK_EDGES = 64
    if save_dir is not None:
        import shutil

        shutil.rmtree(save_dir, ignore_errors=True)
    if log_path is not None:
        Path(log_path).unlink(missing_ok=True)


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(int(sys.argv[2]) if len(sys.argv) > 2 else 7)
    fails = 0
    t0 = time.time()
    for trial in range(n_trials):
        try:
            run_trial(trial, rng)
            print(f"trial {trial} ok ({time.time() - t0:.1f}s)", flush=True)
        except Exception:
            fails += 1
            traceback.print_exc()
            print(f"trial {trial} FAILED", flush=True)
    print(f"{n_trials - fails}/{n_trials} passed in {time.time() - t0:.1f}s")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
