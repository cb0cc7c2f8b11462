"""Settle the 42%-MXU-ceiling claim (VERDICT r4 task #10).

ROADMAP/DEVELOPMENT claim the streaming flat kernel's ~83 TFLOP/s
(~42% of the v5e's 197 TFLOP/s nominal bf16 peak) is a PIPELINE
ceiling on this chip — a zero-VPU Pallas kernel measured the same.
This probe asks the other half of the question: does XLA's own bare
matmul exceed that rate at the flat kernel's exact shapes/precisions?

- If bare ``jnp.dot`` sustains well above ~83 TFLOP/s, the Pallas
  kernel has headroom and the ceiling note is wrong.
- If it plateaus at the same rate, the claim is proven and the exact
  path is certified at this machine's speed of light.

Shapes: the 100k x 384 headline workload (one [8192, 384] @ [384,
102400] pass, f32 inputs / one-bf16-pass precision=DEFAULT, like
flat_topk's fast mode) with three epilogue variants (full f32
materialize, bf16 materialize, fused min-reduce), and the northstar
1M x 768 shape as a tc=2048 column-chunked scan + min-reduce (the
kernel's own streaming structure, zero top-k work).

Run ON the TPU: ``python tools/probes/mxu_ceiling_probe.py``.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])

NOMINAL_TFLOPS = 197.0  # v5e bf16


def rate(fn, flops, inner=4, reps=3):
    import jax.numpy as jnp

    def drain(r):
        float(jnp.asarray(r).reshape(-1)[0].astype(jnp.float32))

    drain(fn())
    vals = []
    for _ in range(reps):
        t0 = time.time()
        r = None
        for _ in range(inner):
            r = fn()
        drain(r)
        vals.append(flops * inner / (time.time() - t0))
    vals.sort()
    return vals[len(vals) // 2]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print("backend:", jax.default_backend(), flush=True)

    key = jax.random.PRNGKey(0)
    b, d, n = 8192, 384, 102_400
    q = jax.random.normal(key, (b, d), jnp.float32)
    c = jax.random.normal(jax.random.fold_in(key, 1), (n, d), jnp.float32)
    flops = 2.0 * b * d * n

    dot_f32 = jax.jit(lambda a, bb: a @ bb.T)
    dot_bf16out = jax.jit(lambda a, bb: jax.lax.dot_general(
        a, bb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.bfloat16
    ))
    dot_min = jax.jit(lambda a, bb: jnp.min(a @ bb.T, axis=1))

    for name, fn in [
        ("dot_f32out_100k", lambda: dot_f32(q, c)),
        ("dot_bf16out_100k", lambda: dot_bf16out(q, c)),
        ("dot_minreduce_100k", lambda: dot_min(q, c)),
    ]:
        r = rate(fn, flops)
        print(f"{name:24s} {r/1e12:7.1f} TFLOP/s "
              f"({r/1e12/NOMINAL_TFLOPS*100:4.1f}% of nominal)", flush=True)

    # northstar shape, streamed in tc=2048 column chunks like the
    # kernel (min-reduce epilogue only — zero top-k work)
    d2, tc = 768, 2048
    nch = 1_000_000 // tc           # truncate to a whole-chunk corpus
    n2 = nch * tc
    c2 = jax.random.normal(jax.random.fold_in(key, 2), (n2, d2), jnp.float32)
    q2 = jax.random.normal(jax.random.fold_in(key, 3), (b, d2), jnp.float32)
    flops2 = 2.0 * b * d2 * n2

    @jax.jit
    def scan_min(qq, cc):
        def step(acc, chunk):
            m = jnp.min(qq @ chunk.T, axis=1)
            return jnp.minimum(acc, m), None

        acc, _ = jax.lax.scan(
            step, jnp.full((b,), jnp.inf, jnp.float32),
            cc.reshape(nch, tc, d2),
        )
        return acc

    r = rate(lambda: scan_min(q2, c2), flops2, inner=2)
    print(f"{'scan_minreduce_1m_768':24s} {r/1e12:7.1f} TFLOP/s "
          f"({r/1e12/NOMINAL_TFLOPS*100:4.1f}% of nominal)", flush=True)

    # the shipped kernel's fast mode at the same 100k shape, full
    # distance+top-k epilogue, for direct comparison
    from muninn_tpu.ops.pallas_flat import flat_topk

    qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    cn = c / jnp.linalg.norm(c, axis=1, keepdims=True)

    def run_kernel():
        return flat_topk(qn, cn, 10, metric="cosine", precision="default")[1]

    r = rate(run_kernel, flops)
    print(f"{'flat_topk_fast_100k':24s} {r/1e12:7.1f} TFLOP/s "
          f"({r/1e12/NOMINAL_TFLOPS*100:4.1f}% of nominal)", flush=True)


if __name__ == "__main__":
    main()
