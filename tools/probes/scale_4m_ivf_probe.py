"""IVF engine at 4M x 768 cosine on ONE chip — the northstar corpus
law at 4x the rows (40x the reference's largest demonstrated corpus;
round-4 VERDICT #2: the tier the bf16-intermediate OOM blocked).

HBM accounting (15.75 GB budget):
- rows generate in 1M chunks and stream into a bf16 store
  (``store_dtype``, 6.15 GB) via ``load_rows`` — the corpus exists
  once, never beside a full f32 copy
- cluster blocks are DIRECT-int8: ``_pack_blocks_int8`` quantizes
  inside the pack scan, so the old 7.37 GB bf16 block intermediate
  never exists; steady blocks = 3.07 GB int8 + 16 MB scales
  (round-4's pack path peaked store 6.15 + bf16 blocks 7.37 + int8
  3.07 = 16.6 GB -> OOM; now 6.15 + 3.07 + ~0.4 GB chunk transients)
- ground truth is a chunked exact scan (bf16 rows dequantized per
  2048-row chunk; running top-k merge)
- query peak ~10.5 GB (store + int8 blocks + [B, nlist] routing),
  with the exact f32 rescore tier reading the bf16 store directly

Run ON the TPU: ``python tools/probes/scale_4m_ivf_probe.py``
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from muninn_tpu.index.ivf import IvfIndex, _ivf_search

    D, B, K = 768, 8192, 10
    N = 4_000_000
    CHUNK = 1_000_000
    CAP = 4_003_840          # 2048-aligned
    GTCH = 2048

    print(f"backend={jax.default_backend()}  N={N:,} x {D}", flush=True)

    # centers stay UNNORMALIZED — the bench's generator law. Center
    # norm ~sqrt(d) dominates the 0.3/dim noise, giving strongly
    # clustered rows; normalizing centers to unit length makes noise
    # dominate and the corpus effectively UNIFORM on the sphere, where
    # no cluster router can find the (tail-distributed) true neighbors
    # — an earlier probe did exactly that and measured recall 0.03
    # while the engine was fine (DEVELOPMENT.md "IVF data-regime
    # bounds").
    centers = jax.jit(
        lambda k: jax.random.normal(k, (4096, D), jnp.float32)
    )(jax.random.PRNGKey(21))

    @jax.jit
    def gen_chunk(centers, key):
        ka, kn = jax.random.split(key)
        a = jax.random.randint(ka, (CHUNK,), 0, 4096)
        x = centers[a] + 0.3 * jax.random.normal(kn, (CHUNK, D))
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    @jax.jit
    def gen_queries(xc, key):
        # perturbed CORPUS rows — the bench methodology (queries at
        # cluster centers make the true top-k a tie lottery)
        ka, kn = jax.random.split(key)
        rows = xc[jax.random.randint(ka, (B,), 0, CHUNK)]
        q = rows + 0.05 * jax.random.normal(kn, (B, D))
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    q = None
    t0 = time.time()
    ivf = IvfIndex(D, "cosine", cluster_size=128, rescore_r=32,
                   quant="int8", capacity=CAP, seed=42,
                   store_dtype=jnp.bfloat16)
    for i in range(N // CHUNK):
        xc = gen_chunk(centers, jax.random.PRNGKey(100 + i))
        if i == 0:
            q = gen_queries(xc, jax.random.PRNGKey(23))
        ivf.load_rows(np.arange(i * CHUNK, (i + 1) * CHUNK), xc)
        del xc
        _ = np.asarray(ivf.store.vectors[0, 0])  # drain before next chunk
    print(f"{N} rows streamed into the store in {time.time() - t0:.1f}s "
          f"({ivf.store.vectors.nbytes / 1e9:.2f} GB bf16)", flush=True)

    # chunked exact ground truth off the bf16 store (512 queries)
    NCH = CAP // GTCH

    @jax.jit
    def exact_gt(q5, vecs, valid):
        def step(carry, xs):
            bd, bi = carry
            chunk, va, start = xs
            ch = chunk.astype(jnp.float32)
            d = 1.0 - jax.lax.dot_general(
                q5, ch, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            d = jnp.where(va[None, :], d, jnp.inf)
            neg, idx = jax.lax.top_k(-d, K)
            gi = start + idx.astype(jnp.int32)
            mv = jnp.concatenate([bd, -neg], axis=1)
            mi = jnp.concatenate([bi, gi], axis=1)
            nb, sel = jax.lax.top_k(-mv, K)
            return (-nb, jnp.take_along_axis(mi, sel, axis=1)), None

        (bd, bi), _ = jax.lax.scan(
            step,
            (jnp.full((512, K), jnp.inf), jnp.full((512, K), -1, jnp.int32)),
            (vecs.reshape(NCH, GTCH, D), valid.reshape(NCH, GTCH),
             jnp.arange(NCH, dtype=jnp.int32)[:, None] * GTCH),
        )
        return bi

    t0 = time.time()
    gt = np.asarray(exact_gt(q[:512], ivf.store.vectors, ivf.store.valid))
    print(f"exact ground truth (512 qs) in {time.time() - t0:.1f}s",
          flush=True)

    t0 = time.time()
    ivf.rebuild()
    _ = np.asarray(ivf.member_slots[0, 0])
    print(f"IVF built in {time.time() - t0:.1f}s "
          f"(nlist={ivf.nlist}, {ivf.blocks.dtype} blocks "
          f"{ivf.blocks.nbytes / 1e9:.2f} GB)", flush=True)

    jq = jnp.asarray(q, jnp.float32)

    def drain(r):
        float(jnp.asarray(r).reshape(-1)[0].astype(jnp.float32))

    for p in (8, 10, 12, 16):
        r = min(max(32, K), p * ivf.cluster_size)
        ids, _d = ivf.search(np.asarray(q[:512]), k=K, nprobe=p)
        rec = np.mean(
            [len(set(a[a >= 0]) & set(b)) / K for a, b in zip(ids, gt)]
        )

        def run(pp=p, rr=r):
            return _ivf_search(
                jq, ivf.centroids, ivf.blocks, ivf.member_slots,
                ivf.store.vectors, ivf.store.valid, ivf.metric,
                K, pp, rr, ivf._fused_ok(), False,
                scales=ivf.block_scales,
            )[1]

        drain(run())
        vals = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                out = run()
            drain(out)
            vals.append(B * 3 / (time.time() - t0))
        vals.sort()
        print(f"nprobe={p}: {vals[1]:9.1f} QPS  recall@10={rec:.4f} "
              f"[{vals[0]:.0f}, {vals[-1]:.0f}]", flush=True)


if __name__ == "__main__":
    main()
