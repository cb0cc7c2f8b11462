"""IVF randomized churn differential: interleaved insert/delete waves
vs a live-set flat oracle; every returned id must be live, recall must
hold through churn, and save/load must preserve search results."""
import sys, time, tempfile, traceback
from pathlib import Path

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.index.ivf import IvfIndex
from muninn_tpu.io.checkpoint import save_ivf, load_ivf

n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10
rng = np.random.default_rng(23)
fails = 0
t0 = time.time()
for trial in range(n_trials):
    dim = int(rng.choice([8, 16, 32]))
    metric = str(rng.choice(["l2", "cosine", "inner_product"]))
    cs = int(rng.choice([32, 64, 128]))
    quant = str(rng.choice(["bf16", "int8"]))
    n0 = int(rng.integers(400, 1500))
    tag = f"trial={trial} dim={dim} metric={metric} cs={cs} quant={quant} n0={n0}"
    try:
        idx = IvfIndex(dim, metric, cluster_size=cs, seed=trial,
                       quant=quant)
        live = {}
        nid = 0
        vecs0 = rng.standard_normal((n0, dim)).astype(np.float32)
        ids0 = np.arange(n0); nid = n0
        idx.insert(ids0, vecs0)
        live.update(zip(ids0.tolist(), vecs0))
        for phase in range(4):
            n_ins = int(rng.integers(30, 150))
            v = rng.standard_normal((n_ins, dim)).astype(np.float32)
            ids = np.arange(nid, nid + n_ins); nid += n_ins
            idx.insert(ids, v)
            live.update(zip(ids.tolist(), v))
            if phase >= 1:
                kill = rng.choice(sorted(live), size=min(60, len(live) // 4),
                                  replace=False)
                idx.delete(kill)
                for i in kill.tolist():
                    del live[i]
        keys = np.array(sorted(live))
        mat = np.stack([live[i] for i in keys.tolist()])
        flat = FlatIndex(dim, metric, use_pallas=False,
                         capacity=int(2 ** np.ceil(np.log2(len(keys) + 1))))
        flat.insert(keys, mat)
        q = mat[rng.choice(len(keys), 25, replace=False)] + \
            0.03 * rng.standard_normal((25, dim)).astype(np.float32)
        nprobe = max(4, idx.nlist)  # probe everything: recall should be ~1
        got, _ = idx.search(q, k=5, nprobe=min(nprobe, idx.nlist))
        want, _ = flat.search(q, k=5)
        assert set(got[got >= 0].tolist()) <= set(keys.tolist()), "ghost ids"
        hits = sum(len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
                   for a, b in zip(got, want))
        rec = hits / (25 * 5)
        assert rec >= 0.9, f"recall {rec:.3f}"
        # checkpoint roundtrip mid-churn state
        with tempfile.TemporaryDirectory() as td:
            save_ivf(idx, Path(td) / "ck")
            idx2 = load_ivf(Path(td) / "ck")
            g2, _ = idx2.search(q, k=5, nprobe=min(nprobe, idx2.nlist))
            assert np.array_equal(got, g2), "checkpoint changed results"
        print(f"ok {tag} recall={rec:.3f} ({time.time()-t0:.0f}s)", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()
print(f"done: {n_trials} trials, {fails} failures", flush=True)
