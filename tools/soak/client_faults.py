"""Client-SDK fault-injection campaign: EngineClient driven through a
fault-injecting HTTP proxy in front of a real EngineServer.

Faults per request (seeded): pass-through, injected 500, connection
closed before any response, garbled 200 body, long delay (client times
out; request still applied). Contract checks:

  1. The SDK raises ONLY MuninnClientError subclasses — never raw
     urllib/JSON errors.
  2. Mutations are never retried: each unique mutation body reaches the
     real server at most once (a retry could re-apply an insert the
     server already ran — the round-3 review bug class).
  3. Idempotent reads retry through injected 500s/hangups.
  4. Final state == the set of mutations the proxy actually forwarded
     (differential against a direct no-proxy client).

Usage: python tools/soak/client_faults.py [trials]
"""
import json
import sys
import threading
import time
import traceback
import urllib.request
import urllib.error
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.client import EngineClient, MuninnClientError
from muninn_tpu.serve import EngineServer

MUTATING = ("/index/insert", "/index/delete", "/index/create",
            "/graph/create", "/graph/add_edges")


class FaultProxy:
    """HTTP reverse proxy injecting faults per request (seeded RNG)."""

    def __init__(self, upstream_port: int, seed: int):
        self.upstream = f"http://127.0.0.1:{upstream_port}"
        self.rng = np.random.default_rng(seed)
        self.rng_lock = threading.Lock()
        self.log_lock = threading.Lock()
        self.forwarded: dict[bytes, int] = {}   # request body -> count
        # upstream completions in ARRIVAL order (delayed forwards can
        # overtake each other, so the state oracle must replay what the
        # server actually saw, not what the proxy intended to send)
        self.completed: list[tuple[str, dict, int, dict]] = []
        proxy = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _serve(self):
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b""
                with proxy.rng_lock:
                    u = float(proxy.rng.random())
                if u < 0.12:                      # injected 500
                    payload = json.dumps({"error": "injected fault"}).encode()
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                if u < 0.20:                      # hangup before response
                    self.close_connection = True
                    self.connection.close()
                    return
                if u < 0.26:                      # garbled 200 body
                    payload = b"{definitely: not json"
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                delay = u < 0.32                  # delay past client timeout
                # log BEFORE the delay: a delayed request is already
                # committed to reach the server; the end-of-trial state
                # check must count it (it raced the log otherwise)
                key = self.path.encode() + b"\x00" + body
                with proxy.log_lock:
                    proxy.forwarded[key] = proxy.forwarded.get(key, 0) + 1
                if delay:
                    time.sleep(1.2)
                req = urllib.request.Request(
                    proxy.upstream + self.path, data=body or None,
                    headers={"Content-Type": "application/json"})
                try:
                    with urllib.request.urlopen(req, timeout=30) as r:
                        payload, status = r.read(), r.status
                except urllib.error.HTTPError as e:
                    payload, status = e.read(), e.code
                try:
                    resp = json.loads(payload)
                except ValueError:
                    resp = {}
                with proxy.log_lock:
                    proxy.completed.append(
                        (self.path, json.loads(body) if body else {},
                         status, resp))
                try:
                    self.send_response(status)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                except BrokenPipeError:
                    pass  # client timed out mid-delay; response moot

            do_GET = do_POST = _serve

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def mutation_counts(self):
        with self.log_lock:
            return {k: v for k, v in self.forwarded.items()
                    if k.split(b"\x00")[0].decode().startswith(MUTATING)}

    def applied(self, path: str):
        """Decoded bodies of forwarded requests for one path."""
        with self.log_lock:
            out = []
            for k in self.forwarded:
                p, body = k.split(b"\x00", 1)
                if p.decode() == path and body:
                    out.append(json.loads(body))
            return out

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def one_trial(trial: int) -> list[str]:
    errs: list[str] = []
    srv = EngineServer()
    real_port = srv.start(port=0)
    proxy = FaultProxy(real_port, seed=1000 + trial)
    rng = np.random.default_rng(trial)
    dim = int(rng.integers(4, 24))
    direct = EngineClient(f"http://127.0.0.1:{real_port}",
                          timeout=30, retries=0)
    flaky = EngineClient(f"http://127.0.0.1:{proxy.port}",
                         timeout=0.6, retries=3, backoff=0.05)
    try:
        direct.create_index("v", dim=dim, metric="l2", kind="flat")
        vecs: dict[int, np.ndarray] = {}
        next_id = 0
        tried_delete: set[int] = set()  # one delete issue per id: any
        # repeated body reaching the server then MUST be a client retry
        idx = flaky.index("v")
        for step in range(30):
            op = rng.random()
            try:
                if op < 0.45:                       # insert unique batch
                    nb = int(rng.integers(1, 6))
                    ids = list(range(next_id, next_id + nb))
                    next_id += nb
                    vs = rng.standard_normal((nb, dim)).astype(np.float32)
                    for i, v in zip(ids, vs):
                        vecs[i] = v
                    idx.insert(ids, vs)
                elif op < 0.60:                     # delete a known-applied id
                    live = _applied_ids(proxy) - tried_delete
                    if live:
                        pick = sorted(live)[int(rng.integers(len(live)))]
                        tried_delete.add(pick)
                        idx.delete([pick])
                elif op < 0.9:                      # search (idempotent)
                    if vecs:
                        q = list(vecs.values())[0]
                        ids_, dists_ = idx.search(np.asarray([q]), k=3)
                        assert len(ids_) == 1 and len(ids_[0]) <= 3
                else:                               # health/stats reads
                    flaky.health()
            except MuninnClientError:
                pass                                # typed: contract held
            except Exception as e:                  # noqa: BLE001
                errs.append(
                    f"step={step} UNTYPED {type(e).__name__}: {e}")
        time.sleep(1.5)   # let in-flight delayed forwards reach the server
        # contract 2: no mutation body forwarded twice
        for key, count in proxy.mutation_counts().items():
            if count > 1:
                path = key.split(b"\x00")[0].decode()
                errs.append(f"mutation {path} forwarded {count}x")
        # contract 3: reads retry through faults — a fresh idempotent
        # request must eventually succeed (fault rate ~32% per attempt,
        # 4 attempts => ~1% flake; retry the assertion once)
        okread = False
        for _ in range(2):
            try:
                flaky.health()
                okread = True
                break
            except MuninnClientError:
                continue
        if not okread:
            errs.append("idempotent read failed through 2x4 attempts")
        # contract 4: final state == forwarded mutations
        applied = _applied_ids(proxy)
        for i, v in vecs.items():
            ids_, dists_ = direct.index("v").search(np.asarray([v]), k=1)
            hit = ids_[0][0] == i and dists_[0][0] < 1e-6
            if (i in applied) != hit:
                errs.append(f"state mismatch id={i}: applied="
                            f"{i in applied} hit={hit} "
                            f"inserts={proxy.applied('/index/insert')} "
                            f"deletes={proxy.applied('/index/delete')}")
    finally:
        proxy.stop()
        srv.stop()
    return errs


def _applied_ids(proxy: FaultProxy) -> set[int]:
    """Replay upstream completions in the order the server saw them
    (a delayed insert can land AFTER a pass-through delete of the same
    id; forward-intent order would call that id deleted while the
    server correctly still has it)."""
    with proxy.log_lock:
        seq = list(proxy.completed)
    ids: set[int] = set()
    for path, body, status, _resp in seq:
        if status != 200:
            continue
        if path == "/index/insert":
            ids.update(body.get("ids", []))
        elif path == "/index/delete":
            ids.difference_update(body.get("ids", []))
    return ids


def concurrent_throughput_trial() -> list[str]:
    """Concurrent-client coalescing assertion (VERDICT r4 task #7):
    N clients firing single-query searches simultaneously must be
    served in FEWER engine dispatches than requests (the micro-batch
    window merging them), with every client receiving its own correct
    rows. Runs against a direct server (no fault proxy — this phase
    asserts the batching contract, not fault behavior)."""
    import threading

    import numpy as np

    from muninn_tpu.serve import EngineServer

    errs: list[str] = []
    srv = EngineServer(coalesce_window=0.05)
    port = srv.start(port=0)
    try:
        from muninn_tpu.client import EngineClient

        n, d, n_clients, rounds = 400, 24, 16, 4
        rng = np.random.default_rng(7)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        boot = EngineClient(f"http://127.0.0.1:{port}")
        boot.create_index("soak", d, kind="flat", metric="cosine")
        boot.index("soak").insert(list(range(n)), x.tolist())

        bad: list[str] = []

        def client(ci: int):
            c = EngineClient(f"http://127.0.0.1:{port}")
            for r in range(rounds):
                qi = (ci * rounds + r) % n
                ids, dists = c.index("soak").search([x[qi].tolist()], k=3)
                if ids[0][0] != qi:
                    bad.append(f"client {ci} round {r}: got {ids[0][0]} "
                               f"want {qi}")

        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(n_clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        errs += bad
        total = n_clients * rounds
        if srv.coalescer.requests < total:
            errs.append(
                f"only {srv.coalescer.requests}/{total} requests reached "
                "the coalescer"
            )
        if srv.coalescer.batches >= total * 0.75:
            errs.append(
                f"coalescing ineffective: {srv.coalescer.batches} engine "
                f"dispatches for {total} concurrent requests"
            )
    finally:
        srv.stop()
    return errs


def mixed_param_concurrent_trial() -> list[str]:
    """Mixed-parameter coalescing assertion (VERDICT r4 task #6):
    concurrent clients with DIFFERENT k/ef/nprobe against one index
    must still share engine dispatches (pad to the window max, slice
    back per member), each receiving its own k columns with a correct
    top-1, and mixed-traffic throughput must stay within ~0.8x of the
    uniform-param coalesced rate measured on the same server."""
    import threading

    import numpy as np

    from muninn_tpu.serve import EngineServer

    errs: list[str] = []
    srv = EngineServer(coalesce_window=0.05)
    port = srv.start(port=0)
    try:
        from muninn_tpu.client import EngineClient

        n, d, n_clients, rounds = 400, 24, 16, 4
        rng = np.random.default_rng(11)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        boot = EngineClient(f"http://127.0.0.1:{port}")
        boot.create_index("mix", d, kind="ivf", metric="cosine",
                          cluster_size=32, nprobe=4)
        boot.index("mix").insert(list(range(n)), x.tolist())

        def run_phase(mixed: bool) -> tuple[list[str], float]:
            bad: list[str] = []
            barrier = threading.Barrier(n_clients)

            def client(ci: int):
                c = EngineClient(f"http://127.0.0.1:{port}")
                h = c.index("mix")
                barrier.wait()
                for r in range(rounds):
                    qi = (ci * rounds + r) % n
                    k = 2 + (ci % 7) if mixed else 3
                    kw = {}
                    if mixed and ci % 3 == 1:
                        kw["nprobe"] = 4 + ci % 5
                    ids, dists = h.search([x[qi].tolist()], k=k, **kw)
                    if len(ids[0]) != k:
                        bad.append(f"client {ci}: got {len(ids[0])} cols, "
                                   f"want k={k}")
                    if ids[0][0] != qi:
                        bad.append(f"client {ci} round {r}: top1 "
                                   f"{ids[0][0]} want {qi}")

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(n_clients)]
            t0 = time.time()
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            qps = n_clients * rounds / (time.time() - t0)
            return bad, qps

        # warm BOTH phases' jit shapes first (each distinct k_max/nprobe
        # is a one-time compile; steady-state is what's asserted)
        run_phase(mixed=False)
        run_phase(mixed=True)
        _, uni_qps = run_phase(mixed=False)
        bad, mix_qps = run_phase(mixed=True)
        errs += bad
        if srv.coalescer.batches >= srv.coalescer.requests * 0.75:
            errs.append(
                f"mixed coalescing ineffective: {srv.coalescer.batches} "
                f"dispatches / {srv.coalescer.requests} requests"
            )
        if mix_qps < 0.8 * uni_qps:  # VERDICT r4 task #6 done-criterion
            errs.append(
                f"mixed-param throughput below 0.8x uniform: "
                f"{mix_qps:.0f} qps vs {uni_qps:.0f} qps"
            )
        print(f"  mixed {mix_qps:.0f} qps vs uniform {uni_qps:.0f} qps "
              f"({mix_qps / uni_qps:.2f}x), "
              f"{srv.coalescer.batches} dispatches / "
              f"{srv.coalescer.requests} requests", flush=True)
    finally:
        srv.stop()
    return errs


if __name__ == "__main__":
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    fails = 0
    t0 = time.time()
    for trial in range(n_trials):
        try:
            errs = one_trial(trial)
        except Exception:
            errs = [f"harness crash: {traceback.format_exc()}"]
        if errs:
            fails += 1
            print(f"FAIL trial={trial}")
            for e in errs:
                print("  " + e)
        else:
            print(f"ok   trial={trial}", flush=True)
    try:
        cerrs = concurrent_throughput_trial()
    except Exception:
        cerrs = [f"harness crash: {traceback.format_exc()}"]
    if cerrs:
        fails += 1
        print("FAIL concurrent-coalescing trial")
        for e in cerrs:
            print("  " + e)
    else:
        print("ok   concurrent-coalescing trial", flush=True)
    try:
        merrs = mixed_param_concurrent_trial()
    except Exception:
        merrs = [f"harness crash: {traceback.format_exc()}"]
    if merrs:
        fails += 1
        print("FAIL mixed-param-coalescing trial")
        for e in merrs:
            print("  " + e)
    else:
        print("ok   mixed-param-coalescing trial", flush=True)
    print(f"{n_trials}+2 trials, {fails} failures, {time.time() - t0:.1f}s")
    sys.exit(1 if fails else 0)
