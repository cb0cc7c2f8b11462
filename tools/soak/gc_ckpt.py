"""GraphCache checkpoint corruption fuzz: corrupt block files,
nodes.jsonl, or the manifest; load must reproduce identical analytics
or raise — plus incremental-save layout integrity across corruptions."""
import sys, time, shutil, tempfile, traceback
from pathlib import Path

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.graph.adjacency import GraphCache

rng = np.random.default_rng(67)
n, e = 200, 9000  # several blocks at BLOCK_EDGES=4096
src = [f"u{i}" for i in rng.integers(0, n, e)]
dst = [f"u{i}" for i in rng.integers(0, n, e)]
gc = GraphCache.from_edges(src, dst)
g = gc.graph()
want = g.pagerank()

fails = 0
t0 = time.time()
with tempfile.TemporaryDirectory() as td:
    ref = Path(td) / "ref"
    gc.save(ref)
    gc2 = GraphCache.load(ref)
    got = gc2.graph().pagerank()
    assert all(abs(want[k] - got[k]) < 1e-9 for k in want), "pristine"
    # incremental save keeps integrity: add edges, save again, reload
    gc.add_edges([f"u{i}" for i in rng.integers(0, n, 50)],
                 [f"u{i}" for i in rng.integers(0, n, 50)])
    gc.save(ref)
    gc3 = GraphCache.load(ref)
    assert gc3.num_edges == gc.num_edges, "incremental save edge count"
    w2 = gc.graph().pagerank()
    g2 = gc3.graph().pagerank()
    assert all(abs(w2[k] - g2[k]) < 1e-9 for k in w2), "post-delta load"
    want = w2

    files = sorted(p for p in ref.rglob("*") if p.is_file())
    print("files:", [f.name for f in files], flush=True)
    for r in range(40):
        work = Path(td) / f"w{r}"
        shutil.copytree(ref, work)
        victim = work / str(rng.choice([str(f.name) for f in files]))
        data = victim.read_bytes()
        op = int(rng.integers(0, 4))
        tag = f"r={r} op={op} victim={victim.name}"
        try:
            if op == 0 and len(data) > 1:
                victim.write_bytes(data[: int(rng.integers(0, len(data)))])
            elif op == 1 and len(data) > 0:
                b = bytearray(data)
                for _ in range(int(rng.integers(1, 6))):
                    b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
                victim.write_bytes(bytes(b))
            elif op == 2:
                victim.unlink()
            else:
                victim.write_bytes(bytes(rng.integers(0, 256, 48, dtype=np.uint8)))
            try:
                gcx = GraphCache.load(work)
                gx = gcx.graph().pagerank()
            except Exception as ex:
                print(f"ok  {tag} -> {type(ex).__name__}", flush=True)
                continue
            same = (set(gx) == set(want)
                    and all(abs(want[k] - gx[k]) < 1e-9 for k in want))
            if same:
                print(f"ok  {tag} -> identical", flush=True)
            else:
                raise AssertionError("SILENT CORRUPTION")
        except AssertionError:
            fails += 1
            print(f"FAIL {tag}", flush=True)
            traceback.print_exc()
print(f"done ({time.time()-t0:.0f}s): {fails} silent corruptions", flush=True)
