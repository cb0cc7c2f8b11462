"""ops/topk fuzz vs brute-force numpy references: masked_topk,
merge_topk (dedup, best-occurrence-wins), merge_topk_flagged (flag
carry: expanded wins on duplicate), sorted_topk_unique (fixed width,
inf/-1 padding) across random shapes, duplicate densities, and masks."""
import sys, time, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.ops.topk import (
    masked_topk, merge_topk, merge_topk_flagged, sorted_topk_unique)

rng = np.random.default_rng(47)
n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 150
fails = 0
t0 = time.time()


def np_masked_topk(d, k, mask, ids):
    d = np.where(mask, d, np.inf) if mask is not None else d.copy()
    out_d = np.full(d.shape[:-1] + (k,), np.inf, np.float32)
    out_i = np.full(d.shape[:-1] + (k,), -1, np.int32)
    idx = np.argsort(d, axis=-1, kind="stable")[..., :k]
    sd = np.take_along_axis(d, idx, axis=-1)
    si = (np.take_along_axis(np.broadcast_to(ids, d.shape), idx, axis=-1)
          if ids is not None else idx)
    kk = min(k, d.shape[-1])
    out_d[..., :kk] = sd[..., :kk]
    out_i[..., :kk] = np.where(np.isinf(sd), -1, si)[..., :kk]
    return out_d, out_i


for trial in range(n_trials):
    b = int(rng.integers(1, 5))
    n = int(rng.integers(1, 40))
    k = int(rng.integers(1, 20))
    # distances with ties to stress sort stability assumptions
    d = rng.choice([0.5, 1.0, 2.0, 3.5], (b, n)).astype(np.float32)
    mask = rng.random((b, n)) < 0.8 if rng.random() < 0.7 else None
    ids = (rng.integers(0, max(2, n), (b, n)).astype(np.int32)
           if rng.random() < 0.5 else None)
    tag = f"trial={trial} b={b} n={n} k={k} mask={mask is not None} ids={ids is not None}"
    try:
        gd, gi = map(np.asarray, masked_topk(d, k, mask=mask, ids=ids))
        wd, wi = np_masked_topk(d, k, mask, ids)
        assert np.allclose(gd, wd), ("masked_topk dists", gd, wd)
        # with ties/dup ids, the id choice may differ but the DISTANCE of
        # the id it picked must match, every returned id must be valid
        # and its source distance must equal the reported one
        for bb in range(b):
            for j in range(k):
                if gi[bb, j] >= 0:
                    src = np.where(
                        (ids[bb] if ids is not None else np.arange(n)) == gi[bb, j],
                        np.where(mask[bb], d[bb], np.inf) if mask is not None else d[bb],
                        np.inf).min()
                    assert abs(src - gd[bb, j]) < 1e-6 or src <= gd[bb, j] + 1e-6, (
                        "reported dist not achievable", bb, j)
                else:
                    assert np.isinf(gd[bb, j])

        # merge_topk: best-occurrence per id, width ka, ascending
        ka, kb = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        da = np.sort(rng.choice([0.5, 1.0, 2.0, 9.9], (b, ka)), axis=-1).astype(np.float32)
        db = np.sort(rng.choice([0.4, 1.0, 2.5, 9.9], (b, kb)), axis=-1).astype(np.float32)
        ia = rng.integers(-1, 6, (b, ka)).astype(np.int32)
        ib = rng.integers(-1, 6, (b, kb)).astype(np.int32)
        da = np.where(ia < 0, np.inf, da); db = np.where(ib < 0, np.inf, db)
        md, mi = map(np.asarray, merge_topk(da, ia, db, ib))
        assert md.shape == (b, ka)
        for bb in range(b):
            best = {}
            for dd, ii in list(zip(da[bb], ia[bb])) + list(zip(db[bb], ib[bb])):
                if ii >= 0:
                    best[ii] = min(best.get(ii, np.inf), dd)
            want = sorted((v, kk) for kk, v in best.items())[:ka]
            got = [(md[bb, j], mi[bb, j]) for j in range(ka) if mi[bb, j] >= 0]
            assert len(got) == len(want), ("merge count", got, want)
            for (wv, wk), (gv, gk) in zip(want, got):
                assert abs(wv - gv) < 1e-6, ("merge dists", want, got)
                # id may differ only under exact ties
                if abs(wv - gv) < 1e-9 and wk != gk:
                    assert any(abs(v - wv) < 1e-9 and kk == gk for v, kk in best.items() for kk2 in [0])
            assert all(md[bb, j] <= md[bb, j + 1] + 1e-9 for j in range(ka - 1))

        # sorted_topk_unique: fixed width, unique ids, padding
        sk = int(rng.integers(1, 15))
        sd_, si_ = map(np.asarray, sorted_topk_unique(da, ia, sk))
        assert sd_.shape == (b, sk)
        for bb in range(b):
            valid = si_[bb][si_[bb] >= 0]
            assert len(valid) == len(set(valid.tolist())), "dup ids"
            assert all(np.isinf(sd_[bb][si_[bb] < 0]))

        # merge_topk_flagged: flag=True wins on duplicate id
        fa = rng.random((b, ka)) < 0.5
        fb = rng.random((b, kb)) < 0.5
        fd, fi, ff = map(np.asarray, merge_topk_flagged(da, ia, fa, db, ib, fb))
        for bb in range(b):
            flag_true = {ii for ii, fl in list(zip(ia[bb], fa[bb])) +
                         list(zip(ib[bb], fb[bb])) if ii >= 0 and fl}
            for j in range(ka):
                if fi[bb, j] >= 0 and fi[bb, j] in flag_true:
                    assert ff[bb, j], ("flag lost", bb, j, fi[bb, j])
        if trial % 30 == 0:
            print(f"... {tag} ({time.time()-t0:.0f}s)", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()
print(f"done: {n_trials} trials, {fails} failures", flush=True)
