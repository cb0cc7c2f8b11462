"""Checkpoint corruption fuzz: save each index kind, randomly corrupt
the directory (truncate a file, flip bytes, delete a file, swap the
manifest kind), then load. Contract: load either reproduces identical
search results or raises a CLEAN exception — it must never return a
silently-corrupt index."""
import sys, time, shutil, tempfile, traceback
from pathlib import Path

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.index.hnsw import HnswIndex
from muninn_tpu.index.ivf import IvfIndex
from muninn_tpu.io import checkpoint as ck

rng = np.random.default_rng(41)
dim = 16
n = 700
vecs = rng.standard_normal((n, dim)).astype(np.float32)
ids = np.arange(n)
q = vecs[:12] + 0.03 * rng.standard_normal((12, dim)).astype(np.float32)

def build(kind):
    if kind == "flat":
        x = FlatIndex(dim, "cosine", use_pallas=False, capacity=1024)
        x.insert(ids, vecs); return x, ck.save_flat, ck.load_flat
    if kind == "hnsw":
        x = HnswIndex(dim, "cosine", m=6, ef_construction=48)
        x.insert(ids, vecs); return x, ck.save_hnsw, ck.load_hnsw
    x = IvfIndex(dim, "cosine", cluster_size=64)
    x.insert(ids, vecs); return x, ck.save_ivf, ck.load_ivf

n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 20
fails = 0
t0 = time.time()
for kind in ("flat", "hnsw", "ivf"):
    idx, save, load = build(kind)
    want, _ = idx.search(q, k=5)
    with tempfile.TemporaryDirectory() as td:
        ref = Path(td) / "ref"
        save(idx, ref)
        # sanity: pristine load reproduces results
        got, _ = load(ref).search(q, k=5)
        assert np.array_equal(want, got), f"{kind} pristine roundtrip"
        files = sorted(p for p in ref.rglob("*") if p.is_file())
        print(f"{kind}: files={[f.name for f in files]}", flush=True)
        for r in range(n_rounds):
            work = Path(td) / f"w{r}"
            shutil.copytree(ref, work)
            victim = work / rng.choice([f.relative_to(ref) for f in files])
            op = int(rng.integers(0, 4))
            data = victim.read_bytes()
            tag = f"{kind} r={r} op={op} victim={victim.name}"
            try:
                if op == 0 and len(data) > 1:      # truncate
                    victim.write_bytes(data[: int(rng.integers(0, len(data)))])
                elif op == 1 and len(data) > 0:    # flip random bytes
                    b = bytearray(data)
                    for _ in range(int(rng.integers(1, 9))):
                        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
                    victim.write_bytes(bytes(b))
                elif op == 2:                      # delete the file
                    victim.unlink()
                else:                              # garbage overwrite
                    victim.write_bytes(bytes(rng.integers(0, 256, 64, dtype=np.uint8)))
                try:
                    idx2 = load(work)
                    got2, _ = idx2.search(q, k=5)
                except Exception as e:
                    # clean failure: any raised exception is acceptable,
                    # but it must not be a hard crash (segfault would
                    # kill the process before this point)
                    print(f"ok  {tag} -> {type(e).__name__}", flush=True)
                    continue
                if np.array_equal(want, got2):
                    print(f"ok  {tag} -> loaded, identical (corruption in "
                          f"unused region or benign)", flush=True)
                else:
                    raise AssertionError(
                        f"SILENT CORRUPTION: load succeeded, results differ")
            except AssertionError:
                fails += 1
                print(f"FAIL {tag}", flush=True)
                traceback.print_exc()
print(f"done ({time.time()-t0:.0f}s): {fails} silent corruptions", flush=True)
