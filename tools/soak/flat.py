"""flat_topk random-geometry fuzz vs brute-force numpy: odd B/N/d,
validity masks (incl. all-invalid and single-valid), metrics, k >= N,
duplicate rows, precision modes, and tile sizes. interpret=True on CPU
(the same kernel code path the TPU runs compiled)."""
import sys, time, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.ops.distance import Metric
from muninn_tpu.ops.pallas_flat import flat_topk

rng = np.random.default_rng(73)
n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 40
fails = 0
t0 = time.time()

def np_ref(q, c, k, metric, valid):
    if metric == Metric.COSINE:
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
        d = 1.0 - qn @ cn.T
    elif metric == Metric.L2:
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    else:
        d = -(q @ c.T)
    if valid is not None:
        d = np.where(valid[None, :], d, np.inf)
    out_d = np.sort(d, axis=1)[:, :k]
    if out_d.shape[1] < k:
        out_d = np.pad(out_d, ((0, 0), (0, k - out_d.shape[1])),
                       constant_values=np.inf)
    return out_d

for trial in range(n_trials):
    b = int(rng.integers(1, 20))
    n = int(rng.integers(1, 600))
    d = int(rng.integers(2, 80))
    k = int(rng.choice([1, 3, 10, n + 5]))
    metric = [Metric.L2, Metric.COSINE, Metric.INNER_PRODUCT][trial % 3]
    mode = trial % 4
    valid = None
    if mode == 1:
        valid = rng.random(n) < 0.6
    elif mode == 2:
        valid = np.zeros(n, bool); valid[int(rng.integers(0, n))] = True
    elif mode == 3:
        valid = np.zeros(n, bool)  # all invalid
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    if rng.random() < 0.3 and n > 2:
        c[1] = c[0]  # duplicate rows
    tb = int(rng.choice([8, 64, 256]))
    tc = int(rng.choice([128, 512, 1024]))
    prec = str(rng.choice(["highest", "default"]))
    tag = (f"trial={trial} b={b} n={n} d={d} k={k} m={metric.name} mode={mode} "
           f"tb={tb} tc={tc} prec={prec}")
    try:
        gd, gi = flat_topk(q, c, k, metric=metric,
                           corpus_valid=None if valid is None else valid,
                           tb=tb, tc=tc, interpret=True, precision=prec)
        gd, gi = np.asarray(gd), np.asarray(gi)
        wd = np_ref(q, c, k, metric, valid)
        tol = 2e-3 if prec == "highest" else 3e-2
        finite = np.isfinite(wd)
        assert np.all(np.isinf(gd) == ~finite), ("inf pattern", gd, wd)
        assert np.allclose(gd[finite], wd[finite], atol=tol, rtol=tol), (
            "dists", gd, wd)
        assert np.all((gi >= 0) == finite)
        # every returned id's true distance matches the reported one
        for bb in range(b):
            for j in range(k):
                if gi[bb, j] >= 0:
                    assert valid is None or valid[gi[bb, j]], "invalid id"
        print(f"ok {tag} ({time.time()-t0:.0f}s)", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()
print(f"done: {n_trials} trials, {fails} failures", flush=True)
