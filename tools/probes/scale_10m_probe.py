"""10M x 384 cosine search on ONE v5e chip — 100x the reference's
largest demonstrated corpus (its structures are "acceptable for index
sizes up to ~100K", src/hnsw_algo.c:294-296; its biggest published
point is 100k).

Memory design: the corpus lives as int8 rows + per-row scales
(10M x 384 = 3.84 GB + 40 MB — an f32 store would be 15.4 GB, over
HBM). Generation, ground truth, search and rescore all run CHUNKED on
device; no 10M-row f32 array ever exists:

- generate: lax.scan emits clustered unit rows chunk-by-chunk,
  quantizing each chunk to int8 before the next is made
- retrieve: the int8 streaming Pallas kernel (flat_topk_int8) ranks
  the whole corpus per query batch
- rescore: the top-r candidates dequantize ([B, r, d] gather) and get
  exact f32 distances — the store's truth is the dequantized value
- ground truth: exact f32 ranking over the dequantized corpus,
  computed by a chunked scan for a 512-query slice

Run ON the TPU: ``python tools/probes/scale_10m_probe.py [N_millions]``
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from muninn_tpu.ops.distance import gathered_distances, Metric
    from muninn_tpu.ops.pallas_flat import flat_topk_int8
    from muninn_tpu.ops.topk import sorted_topk_unique

    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    D, B, K, CH = 384, 8192, 10, 65536
    N = n_m * 1_000_000
    N = (N // CH) * CH
    NCH = N // CH
    print(f"backend={jax.default_backend()}  N={N:,} x {D}", flush=True)

    @jax.jit
    def gen_centers(key):
        c = jax.random.normal(key, (4096, D), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    centers = gen_centers(jax.random.PRNGKey(11))

    @jax.jit
    def gen_corpus(centers, key):
        def step(_, k):
            ka, kn = jax.random.split(k)
            a = jax.random.randint(ka, (CH,), 0, 4096)
            x = centers[a] + 0.3 * jax.random.normal(kn, (CH, D))
            x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
            sc = jnp.max(jnp.abs(x), axis=1) / 127.0
            xi = jnp.clip(
                jnp.round(x / jnp.maximum(sc[:, None], 1e-30)), -127, 127
            ).astype(jnp.int8)
            return None, (xi, sc)

        keys = jax.random.split(key, NCH)
        _, (xi, sc) = jax.lax.scan(step, None, keys)
        return xi.reshape(N, D), sc.reshape(N)

    t0 = time.time()
    ci8, csc = gen_corpus(centers, jax.random.PRNGKey(12))
    _ = np.asarray(ci8[0, 0])
    print(f"corpus generated+quantized in {time.time() - t0:.1f}s "
          f"({ci8.nbytes / 1e9:.2f} GB int8)", flush=True)

    @jax.jit
    def gen_queries(centers, key):
        ka, kn = jax.random.split(key)
        a = jax.random.randint(ka, (B,), 0, 4096)
        q = centers[a] + 0.32 * jax.random.normal(kn, (B, D))
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    q = gen_queries(centers, jax.random.PRNGKey(13))

    # ── ground truth: exact f32 over the dequantized corpus (512 qs) ──
    @jax.jit
    def exact_gt(q5, ci8, csc):
        def step(carry, xs):
            bd, bi = carry
            chunk8, chsc, start = xs
            ch = chunk8.astype(jnp.float32) * chsc[:, None]
            d = 1.0 - jax.lax.dot_general(
                q5, ch, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            neg, idx = jax.lax.top_k(-d, K)
            gi = start + idx.astype(jnp.int32)
            mv = jnp.concatenate([bd, -neg], axis=1)
            mi = jnp.concatenate([bi, gi], axis=1)
            nb, sel = jax.lax.top_k(-mv, K)
            return (-nb, jnp.take_along_axis(mi, sel, axis=1)), None

        (bd, bi), _ = jax.lax.scan(
            step,
            (jnp.full((512, K), jnp.inf), jnp.full((512, K), -1, jnp.int32)),
            (ci8.reshape(NCH, CH, D), csc.reshape(NCH, CH),
             jnp.arange(NCH, dtype=jnp.int32)[:, None] * CH),
        )
        return bi

    t0 = time.time()
    gt = np.asarray(exact_gt(q[:512], ci8, csc))
    print(f"exact ground truth (512 qs) in {time.time() - t0:.1f}s",
          flush=True)

    # ── int8 retrieve (+ dequant-exact rescore) ──
    from functools import partial

    @partial(jax.jit, static_argnames=("r",))
    def search(q, ci8, csc, r):
        d8, cand = flat_topk_int8(q, ci8, csc, r, metric="cosine", tc=2048)
        cv = ci8[jnp.maximum(cand, 0)].astype(jnp.float32) \
            * csc[jnp.maximum(cand, 0)][:, :, None]
        dd = gathered_distances(q, cv, Metric.COSINE)
        dd = jnp.where(cand >= 0, dd, jnp.inf)
        return sorted_topk_unique(dd, cand, K)

    def drain(x):
        float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))

    for r in (16, 32):
        ids = np.asarray(search(q[:512], ci8, csc, r=r)[1])
        rec = np.mean([len(set(a) & set(b)) / K for a, b in zip(ids, gt)])
        drain(search(q, ci8, csc, r=r)[1])  # warm full-batch program
        vals = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(2):
                out = search(q, ci8, csc, r=r)[1]
            drain(out)
            vals.append(B * 2 / (time.time() - t0))
        vals.sort()
        print(f"int8 retrieve r={r:3d} + exact rescore: "
              f"{vals[1]:9.1f} QPS  recall@10={rec:.4f} "
              f"[{vals[0]:.0f}, {vals[-1]:.0f}]", flush=True)


if __name__ == "__main__":
    main()
