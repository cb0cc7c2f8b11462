"""HNSW lifecycle edge fuzz: capacity growth in odd waves, repeated
entry-point deletion, delete-EVERYTHING, reinsert of the same ids with
different vectors, zero vectors, empty searches. Oracle: exact flat."""
import sys, time, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.index.hnsw import HnswIndex
from muninn_tpu.index.flat import FlatIndex

rng = np.random.default_rng(79)
n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 8
fails = 0
t0 = time.time()
for trial in range(n_trials):
    dim = 8
    tag = f"trial={trial}"
    try:
        idx = HnswIndex(dim, "l2", m=4, ef_construction=32, capacity=64,
                        seed=trial, wave_size=32)
        total = 150
        vecs = rng.standard_normal((total, dim)).astype(np.float32)
        ids = np.arange(total)
        pos = 0
        while pos < total:                      # growth in odd waves
            step = int(rng.integers(1, 37))
            idx.insert(ids[pos:pos + step], vecs[pos:pos + step])
            pos += step
        assert len(idx) == total

        probe = vecs[0:1]
        killed = []
        for _ in range(10):                     # entry-point churn
            got, _ = idx.search(probe, k=1)
            top = int(np.asarray(got)[0, 0])
            if top < 0:
                break
            idx.delete(np.array([top]))
            killed.append(top)
        got, _ = idx.search(probe, k=10)
        assert not (set(np.asarray(got).ravel().tolist()) & set(killed))

        live = sorted(set(range(total)) - set(killed))
        idx.delete(np.array(live))              # delete EVERYTHING
        assert len(idx) == 0
        e_ids, _ = idx.search(probe, k=5)
        assert (np.asarray(e_ids) == -1).all()

        v2 = rng.standard_normal((20, dim)).astype(np.float32)
        v2[3] = 0.0                             # zero vector
        idx.insert(np.arange(20), v2)           # SAME ids, new vectors
        assert len(idx) == 20
        flat = FlatIndex(dim, "l2", use_pallas=False, capacity=64)
        flat.insert(np.arange(20), v2)
        q = v2 + 0.01 * rng.standard_normal((20, dim)).astype(np.float32)
        got2, _ = idx.search(q, k=3)
        want2, _ = flat.search(q, k=3)
        hits = sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(np.asarray(got2), np.asarray(want2)))
        assert hits / 60 >= 0.95, hits / 60
        z_ids, _ = idx.search(np.zeros((1, dim), np.float32), k=1)
        assert int(np.asarray(z_ids)[0, 0]) == 3
        print(f"ok {tag} ({time.time()-t0:.0f}s)", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()
print(f"done: {n_trials} trials, {fails} failures", flush=True)
