"""Serve-layer concurrency hammer: many threads hitting one
EngineServer with mixed create/insert/search/delete/graph ops.
Contract: every response is either a success or a TYPED error
(MuninnClientError with a .code) — never a raw 500/connection drop —
and the final index state equals the set of successful inserts minus
successful deletes."""
import sys, time, threading, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.serve import EngineServer
from muninn_tpu.client import EngineClient, MuninnClientError

dim = 8
srv = EngineServer()
port = srv.start(port=0)
base = f"http://127.0.0.1:{port}"
n_threads = 8
ops_per_thread = 25
errors = []          # unexpected (untyped) failures
applied = {}         # id -> inserted by which thread (successful)
applied_lock = threading.Lock()
deleted = set()

cli0 = EngineClient(base, retries=1, backoff=0.01)
h0 = cli0.create_index("hammer", dim, metric="l2", kind="flat")


def worker(tid):
    rng = np.random.default_rng(100 + tid)
    cli = EngineClient(base, retries=1, backoff=0.01)
    h = cli.index("hammer")
    for op_i in range(ops_per_thread):
        op = rng.random()
        try:
            if op < 0.45:
                i = int(tid * 10000 + op_i)
                v = rng.standard_normal((1, dim)).astype(np.float32)
                h.insert(np.array([i]), v)
                with applied_lock:
                    applied[i] = v
            elif op < 0.6:
                with applied_lock:
                    live = [i for i in applied
                            if i // 10000 == tid and i not in deleted]
                if live:
                    victim = int(rng.choice(live))
                    h.delete(np.array([victim]))
                    with applied_lock:
                        deleted.add(victim)
            elif op < 0.85:
                q = rng.standard_normal((2, dim)).astype(np.float32)
                ids, d = h.search(q, k=3)
                assert np.asarray(ids).shape == (2, 3)
            elif op < 0.92:
                # duplicate create: must be a TYPED error
                try:
                    cli.create_index("hammer", dim, metric="l2", kind="flat")
                    errors.append((tid, op_i, "duplicate create accepted"))
                except MuninnClientError:
                    pass
            else:
                # duplicate insert: typed error expected. Probe only
                # ids THIS thread inserted and no thread deletes (ids
                # are deleted only via the shared live pick below which
                # can race; own-id probes use a reserved undeletable id)
                with applied_lock:
                    live = [i for i in applied
                            if i // 10000 == tid and i not in deleted]
                if live:
                    i = int(rng.choice(live))
                    try:
                        h.insert(np.array([i]),
                                 rng.standard_normal((1, dim)).astype(np.float32))
                        errors.append((tid, op_i, f"dup insert {i} accepted"))
                    except MuninnClientError:
                        pass
        except MuninnClientError:
            pass  # typed errors are contract-conforming
        except Exception as e:
            errors.append((tid, op_i, f"{type(e).__name__}: {e}"))


threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
t0 = time.time()
for t in threads:
    t.start()
for t in threads:
    t.join()
print(f"hammer done in {time.time()-t0:.1f}s, {len(errors)} unexpected errors")
for e in errors[:10]:
    print("ERR", e)

# final-state check: every live id findable, every deleted id absent
with applied_lock:
    live = {i: v for i, v in applied.items() if i not in deleted}
ok = 0
for i, v in list(live.items())[:40]:
    ids, d = h0.search(v, k=1)
    if int(np.ravel(ids)[0]) == i:
        ok += 1
    else:
        print("MISSING live id", i, "got", ids)
print(f"live-id self-hits: {ok}/{min(40, len(live))}")
for i in list(deleted)[:20]:
    ids, _ = h0.search(applied[i], k=3)
    assert i not in np.ravel(ids).tolist(), f"deleted id {i} still returned"
print("deleted ids absent: ok")
srv.stop()
sys.exit(1 if errors or ok < min(40, len(live)) else 0)
