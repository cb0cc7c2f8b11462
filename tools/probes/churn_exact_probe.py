"""HNSW churn-insert rate: exact-wave vs beam-wave on the real chip
(round-4 VERDICT #3 — 2,029 vec/s via the ef_construction beam was 12x
below the bulk path; the exact-wave mode reuses the flat kernel).

Mirrors bench.py's churn section exactly: 100k x 384 cosine corpus,
steady-state 2048-vec waves (15 waves = 30k vectors), delete/repair
waves, recall after churn vs exact GT on the live set.

    python tools/probes/churn_exact_probe.py [--mode exact|beam|both]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both")
    ap.add_argument("--wave", type=int, default=2048)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=384)
    args = ap.parse_args()

    import sys
    from pathlib import Path

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    # PYTHONPATH breaks axon plugin discovery (CLAUDE.md): insert the
    # repo root AFTER jax init when run from outside the repo
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from muninn_tpu.index.hnsw import HnswIndex
    from muninn_tpu.ops.pallas_flat import flat_topk

    N, DIM, K, CHURN = args.n, args.dim, 10, 32_768

    def gen(key, n, dim, n_clusters):
        kc, ka, kn, kq, kp = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (n_clusters, dim), jnp.float32)
        assign = jax.random.randint(ka, (n,), 0, n_clusters)
        x = centers[assign] + 0.3 * jax.random.normal(kn, (n, dim))
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        q = x[jax.random.randint(kq, (2048,), 0, n)]
        q = q + 0.05 * jax.random.normal(kp, (2048, dim))
        return x, q / jnp.linalg.norm(q, axis=1, keepdims=True)

    corpus_all, queries = jax.jit(gen, static_argnums=(1, 2, 3))(
        jax.random.PRNGKey(7), N + CHURN, DIM, 1000
    )
    corpus_all.block_until_ready()

    modes = ["exact", "beam"] if args.mode == "both" else [args.mode]
    for mode in modes:
        idx = HnswIndex(DIM, "cosine", m=16, ef_construction=200,
                        wave_size=4096, capacity=N + CHURN + 4096,
                        expand=8, seed=42)
        idx.insert_mode = mode
        t0 = time.time()
        idx.insert(np.arange(N), corpus_all[:N])     # bulk
        jax.block_until_ready(idx.neighbors0)
        _ = np.asarray(idx.neighbors0[0, 0])
        build_s = time.time() - t0

        wave_n = args.wave
        idx.wave_size = wave_n
        idx.insert(np.arange(N, N + wave_n), corpus_all[N:N + wave_n])
        _ = np.asarray(idx.neighbors0[0, 0])          # warm compile
        t0 = time.time()
        n_ins = 0
        for w in range(1, CHURN // wave_n):
            s = N + w * wave_n
            idx.insert(np.arange(s, s + wave_n), corpus_all[s:s + wave_n])
            n_ins += wave_n
        _ = np.asarray(idx.neighbors0[0, 0])
        ins_rate = n_ins / (time.time() - t0)

        idx.delete(np.arange(0, 1024))                # warm delete
        t0 = time.time()
        n_del = 0
        for w in range(1, 8):
            idx.delete(np.arange(w * 1024, (w + 1) * 1024))
            n_del += 1024
        _ = np.asarray(idx.neighbors0[0, 0])
        del_rate = n_del / (time.time() - t0)

        live_mask = np.ones(N + CHURN, bool)
        live_mask[:8 * 1024] = False
        live = np.nonzero(live_mask)[0]
        ti = flat_topk(queries, corpus_all[jnp.asarray(live)], K,
                       metric="cosine", precision="highest")[1]
        churn_true = live[np.asarray(ti)]
        ids, _ = idx.search(queries, k=K, ef_search=32)
        hits = sum(len(set(a[a >= 0]) & set(b))
                   for a, b in zip(ids, churn_true))
        print(json.dumps({
            "mode": mode,
            "bulk_vec_per_s": round(N / build_s, 1),
            "incr_insert_vec_per_s": round(ins_rate, 1),
            "delete_repair_per_s": round(del_rate, 1),
            "churn_recall_at_10": round(hits / (2048 * K), 4),
        }), flush=True)
        del idx


if __name__ == "__main__":
    main()
