"""End-to-end HNSW config-space soak on CPU: random (metric, m, efc,
expand, topm, search_quant, ef_search, build path) vs the exact oracle.
Asserts recall floors + engine invariants across combinations the fixed
tests never pair up."""
import sys, time, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.index.hnsw import HnswIndex
from muninn_tpu.index.flat import FlatIndex

n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 20
rng = np.random.default_rng(3)
fails = 0
t0 = time.time()
for trial in range(n_trials):
    metric = str(rng.choice(["inner_product", "inner_product", "l2"]))
    m = int(rng.choice([4, 6, 8, 16]))
    efc = int(rng.choice([32, 64, 100]))
    expand = int(rng.choice([1, 2, 4, 8]))
    n = int(rng.integers(300, 1500))
    dim = int(rng.choice([8, 16, 32]))
    k = int(rng.choice([1, 5, 10]))
    ef = int(rng.choice([24, 48, 96]))
    incremental = bool(rng.random() < 0.5)  # vs bulk build
    tag = (f"trial={trial} metric={metric} m={m} efc={efc} expand={expand} "
           f"n={n} dim={dim} k={k} ef={ef} incr={incremental}")
    try:
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        if metric == "inner_product":
            # keep ip well-posed: positive-norm spread
            vecs *= rng.uniform(0.5, 2.0, (n, 1)).astype(np.float32)
        ids = np.arange(n)
        idx = HnswIndex(dim, metric, m=m, ef_construction=efc,
                        expand=expand, seed=trial,
                        wave_size=256 if incremental else 4096)
        if incremental:
            for lo in range(0, n, 256):
                idx.insert(ids[lo:lo + 256], vecs[lo:lo + 256])
        else:
            idx.insert(ids, vecs)
        flat = FlatIndex(dim, metric, use_pallas=False,
                         capacity=max(2048, n))
        flat.insert(ids, vecs)
        q = vecs[rng.choice(n, 32, replace=False)] + \
            0.05 * rng.standard_normal((32, dim)).astype(np.float32)
        got, _ = idx.search(q, k=k, ef_search=ef)
        want, _ = flat.search(q, k=k)
        hits = sum(len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
                   for a, b in zip(got, want))
        recall = hits / (32 * k)
        # small-N searches route to the exact fused path (<8192 live):
        # recall must be ~1; keep a soft floor for ip ties
        assert recall >= 0.95, f"recall {recall:.3f}"
        assert set(got[got >= 0].tolist()) <= set(ids.tolist())
        print(f"ok {tag} recall={recall:.3f} ({time.time()-t0:.0f}s)",
              flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()
print(f"done: {n_trials} trials, {fails} failures", flush=True)
