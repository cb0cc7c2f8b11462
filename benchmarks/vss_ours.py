"""Our engine's side of the vss same-machine head-to-head.

Run BY ``benchmarks.ref_same_machine`` in a fresh subprocess so the
parent can stay on the CPU backend (the axon TPU tunnel is
single-client and ignores ``JAX_PLATFORMS`` — CLAUDE.md); also usable
standalone:

    python -m benchmarks.vss_ours 10000 384 --ef 64 [--data /tmp/d.npz]

Prints ONE JSON line: build vec/s (cold + warm), matched-batch query
ms/query (``--nq`` queries, one dispatch), batch-8192 engine QPS, and
recall@10 vs the exact-f32 ground truth of the SAME corpus.

Protocol notes (mirrors ``bench.py``):
- ``--data`` (an .npz with ``x`` and ``q``) runs on bit-identical data
  to the reference side; without it the corpus is generated
  device-side from the same generator family (1000 clusters, 0.3
  noise, 0.05 query perturbation) — uploading 100k x 384 f32 through
  this environment's ~2 MB/s tunnel would measure the tunnel, not the
  engine (CLAUDE.md). Either way timing starts from device-resident
  arrays, matching the reference whose corpus is already in process
  memory when its inserts run.
- every timed figure forces a tiny host fetch (tunnel timings via
  ``block_until_ready`` alone under-report).
- warm build is the steady-state rate (cold includes per-process XLA
  cache loading); both are reported.

Reference counterpart: ``src/hnsw_vtab.c`` insert/search paths driven
by ``/root/reference/benchmarks/harness/treatments/vss.py`` parameters
(M=16, ef_construction=200, ef_search=64, cosine, recall@10).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int)
    ap.add_argument("dim", type=int)
    ap.add_argument("--ef", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nq", type=int, default=1024,
                    help="matched query count for the per-query row")
    ap.add_argument("--data", default=None,
                    help=".npz with x [n, dim] and q [nq, dim] for "
                         "bit-identical data vs the reference side")
    ap.add_argument("--big-batch", type=int, default=8192)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from muninn_tpu.index.hnsw import HnswIndex
    from muninn_tpu.ops.pallas_flat import flat_topk

    n, dim, k = args.n, args.dim, args.k
    out: dict = {"op": "vss_ours", "n": n, "dim": dim, "ef": args.ef,
                 "nq": args.nq, "backend": jax.default_backend()}

    if args.data:
        d = np.load(args.data)
        x = jnp.asarray(d["x"])          # untimed upload (see docstring)
        q = jnp.asarray(d["q"])
        out["data"] = "identical-bits"
    else:
        def gen(key):
            kc, ka, kn, kq, kp = jax.random.split(key, 5)
            centers = jax.random.normal(kc, (1000, dim), jnp.float32)
            assign = jax.random.randint(ka, (n,), 0, 1000)
            xx = centers[assign] + 0.3 * jax.random.normal(kn, (n, dim))
            xx = xx / jnp.linalg.norm(xx, axis=1, keepdims=True)
            qq = xx[jax.random.randint(kq, (args.nq,), 0, n)]
            qq = qq + 0.05 * jax.random.normal(kp, (args.nq, dim))
            return xx, qq / jnp.linalg.norm(qq, axis=1, keepdims=True)

        x, q = jax.jit(gen)(jax.random.PRNGKey(7))
        out["data"] = "device-generated-same-family"
    x.block_until_ready()

    # exact ground truth on the same corpus (f32-exact ranking)
    gt = np.asarray(flat_topk(q, x, k, metric="cosine",
                              precision="highest")[1])

    def build():
        idx = HnswIndex(dim, "cosine", m=16, ef_construction=200,
                        capacity=n + 4096, seed=42)
        t0 = time.time()
        idx.insert(np.arange(n), x)
        jax.block_until_ready(idx.neighbors0)
        _ = np.asarray(idx.neighbors0[0, 0])     # force host fetch
        return idx, time.time() - t0

    idx, cold_s = build()
    del idx
    idx, warm_s = build()
    out["build_cold_vec_per_s"] = round(n / cold_s, 1)
    out["build_vec_per_s"] = round(n / warm_s, 1)
    out["build_ms"] = round(warm_s * 1e3, 2)

    # matched-batch query (the reference side times the same queries
    # through its one-at-a-time API; ours is one batched dispatch — the
    # engine contract both SDKs and the server coalescer expose)
    ids, _d = idx.search(q, k=k, ef_search=args.ef)   # warm/compile
    times = []
    for _ in range(5):
        t0 = time.time()
        ids, _d = idx.search(q, k=k, ef_search=args.ef)
        _ = int(np.asarray(ids)[0, 0])
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    rec = sum(len(set(a.tolist()) & set(b.tolist()))
              for a, b in zip(np.asarray(ids), gt)) / (len(gt) * k)
    out["query_ms"] = round(med * 1e3 / len(gt), 4)
    out["recall_at_10"] = round(rec, 4)

    # engine-batch context: big-batch QPS at the same operating point
    B = args.big_batch
    kq2 = jax.random.PRNGKey(11)
    qi = jax.random.randint(kq2, (B,), 0, n)
    qb = x[qi] + 0.05 * jax.random.normal(jax.random.PRNGKey(12), (B, dim))
    qb = qb / jnp.linalg.norm(qb, axis=1, keepdims=True)
    qb.block_until_ready()
    gtb = np.asarray(flat_topk(qb, x, k, metric="cosine",
                               precision="highest")[1])
    idsb, _ = idx.search(qb, k=k, ef_search=args.ef)  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        idsb, _ = idx.search(qb, k=k, ef_search=args.ef)
        _ = int(np.asarray(idsb)[0, 0])
        times.append(time.time() - t0)
    times.sort()
    medb = times[len(times) // 2]
    recb = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(np.asarray(idsb), gtb)) / (B * k)
    out["engine_qps_batch"] = round(B / medb, 1)
    out["engine_batch"] = B
    out["engine_recall_at_10"] = round(recb, 4)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
