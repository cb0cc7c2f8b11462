"""HTTP serving layer + sharded index e2e."""

import json
import urllib.request

import numpy as np
import pytest

from muninn_tpu.serve import EngineServer
from muninn_tpu.parallel.sharded_index import ShardedFlatIndex


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_engine_server_vector_flow(rng):
    srv = EngineServer()
    port = srv.start(port=0)
    try:
        st, r = _post(port, "/index/create",
                      {"name": "v", "dim": 8, "metric": "l2", "kind": "flat"})
        assert st == 200 and r["ok"]
        vecs = rng.standard_normal((20, 8)).astype(np.float32)
        st, r = _post(port, "/index/insert",
                      {"name": "v", "ids": list(range(20)),
                       "vectors": vecs.tolist()})
        assert st == 200 and r["count"] == 20
        st, r = _post(port, "/index/search",
                      {"name": "v", "queries": [vecs[7].tolist()], "k": 3})
        assert st == 200 and r["ids"][0][0] == 7
        st, r = _post(port, "/index/delete", {"name": "v", "ids": [7]})
        assert st == 200
        st, r = _post(port, "/index/search",
                      {"name": "v", "queries": [vecs[7].tolist()], "k": 3})
        assert 7 not in r["ids"][0]
        # probes
        st, r = _post(port, "/index/create",
                      {"name": "v", "dim": 8})
        assert st == 400 and "exists" in r["error"]
        st, r = _post(port, "/index/search", {"name": "nope", "queries": [[0]*8]})
        assert st == 400
    finally:
        srv.stop()


def test_engine_server_graph_flow():
    srv = EngineServer()
    port = srv.start(port=0)
    try:
        st, r = _post(port, "/graph/create",
                      {"name": "g", "src": ["a", "b", "c"], "dst": ["b", "c", "a"]})
        assert st == 200 and r["nodes"] == 3
        st, pr = _post(port, "/graph/query", {"name": "g", "op": "pagerank"})
        assert st == 200 and abs(sum(pr.values()) - 1.0) < 1e-4
        st, rows = _post(port, "/graph/query",
                         {"name": "g", "op": "bfs", "start": "a"})
        assert [row[0] for row in rows][0] == "a"
        st, sp = _post(port, "/graph/query",
                       {"name": "g", "op": "shortest_path", "start": "a", "end": "c"})
        assert sp["path"] == ["a", "b", "c"]
        st, sel = _post(port, "/graph/query",
                        {"name": "g", "op": "select", "selector": "a+1"})
        assert {row[0] for row in sel} == {"a", "b"}
        st, r = _post(port, "/graph/query", {"name": "g", "op": "zzz"})
        assert st == 400
        # health reflects registered objects
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as resp:
            h = json.loads(resp.read())
        assert h["graphs"] == ["g"]
    finally:
        srv.stop()


def test_client_sdk_vector_flow(rng):
    from muninn_tpu.client import EngineClient, MuninnRequestError

    srv = EngineServer()
    port = srv.start(port=0)
    try:
        c = EngineClient(f"http://127.0.0.1:{port}", retries=1, backoff=0.01)
        c.wait_ready(timeout=5)
        idx = c.create_index("v", dim=8, kind="flat")
        vecs = rng.standard_normal((20, 8)).astype(np.float32)
        assert idx.insert(range(20), vecs) == 20
        # batch search
        ids, dists = idx.search(vecs[:2], k=3)
        assert ids[0][0] == 0 and ids[1][0] == 1
        # single-query auto-wrap returns flat lists
        ids, dists = idx.search(vecs[7], k=3)
        assert ids[0] == 7 and dists[0] < 1e-5
        assert idx.delete([7]) == 19
        ids, _ = idx.search(vecs[7], k=3)
        assert 7 not in ids
        # typed 4xx error, not retried
        with pytest.raises(MuninnRequestError) as ei:
            c.create_index("v", dim=8)
        assert ei.value.status == 400 and "exists" in ei.value.message
        with pytest.raises(MuninnRequestError):
            c.index("nope").search(vecs[0], k=1)
    finally:
        srv.stop()


def test_client_sdk_graph_flow():
    from muninn_tpu.client import EngineClient

    srv = EngineServer()
    port = srv.start(port=0)
    try:
        c = EngineClient(f"http://127.0.0.1:{port}")
        g = c.create_graph("g", src=["a", "b", "c"], dst=["b", "c", "a"])
        pr = g.pagerank()
        assert abs(sum(pr.values()) - 1.0) < 1e-4
        sp = g.shortest_path("a", "c")
        assert sp["path"] == ["a", "b", "c"]
        assert {row[0] for row in g.select("a+1")} == {"a", "b"}
        labels = g.leiden()
        assert set(labels["communities"]) == {"a", "b", "c"}
        assert c.health()["graphs"] == ["g"]
    finally:
        srv.stop()


def test_client_connection_error_retries():
    from muninn_tpu.client import EngineClient, MuninnConnectionError

    c = EngineClient("http://127.0.0.1:1", retries=2, backoff=0.01, timeout=0.5)
    assert not c.ping()
    with pytest.raises(MuninnConnectionError):
        c.health()
    with pytest.raises(MuninnConnectionError):
        c.wait_ready(timeout=0.3, interval=0.05)


def test_sharded_flat_index(rng):
    idx = ShardedFlatIndex(16, "l2")
    assert idx.n_shards == 8
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    idx.insert(np.arange(100), vecs)
    ids, d = idx.search(vecs[13], k=3)
    assert ids[0] == 13 and d[0] < 1e-5
    idx.delete([13])
    ids, _ = idx.search(vecs[13], k=3)
    assert 13 not in ids
    with pytest.raises(ValueError):
        idx.insert([14], vecs[:1])
    # growth across shard boundary
    idx.insert(np.arange(1000, 1200), rng.standard_normal((200, 16)).astype(np.float32))
    assert len(idx) == 299


def test_engine_server_quantized_index(rng):
    srv = EngineServer()
    port = srv.start(port=0)
    try:
        st, r = _post(port, "/index/create",
                      {"name": "q8", "dim": 16, "metric": "cosine",
                       "kind": "quantized"})
        assert st == 200 and r["kind"] == "quantized"
        vecs = rng.standard_normal((50, 16)).astype(np.float32)
        st, r = _post(port, "/index/insert",
                      {"name": "q8", "ids": list(range(50)),
                       "vectors": vecs.tolist()})
        assert st == 200 and r["count"] == 50
        st, r = _post(port, "/index/search",
                      {"name": "q8", "queries": [vecs[9].tolist()], "k": 3})
        assert st == 200 and r["ids"][0][0] == 9
    finally:
        srv.stop()


def test_engine_server_tune_endpoint(rng):
    """POST /index/tune autotunes the int8_rescored retrieve width and
    non-tunable kinds 400 cleanly; the client wrapper round-trips."""
    from muninn_tpu.client import EngineClient, MuninnRequestError

    srv = EngineServer()
    port = srv.start(port=0)
    try:
        st, r = _post(port, "/index/create",
                      {"name": "t8", "dim": 16, "metric": "cosine",
                       "kind": "flat", "precision": "int8_rescored"})
        assert st == 200
        vecs = rng.standard_normal((300, 16)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        _post(port, "/index/insert",
              {"name": "t8", "ids": list(range(300)),
               "vectors": vecs.tolist()})
        c = EngineClient(f"http://127.0.0.1:{port}", retries=1, backoff=0.01)
        rep = c.index("t8").tune(k=5, target_recall=0.95)
        assert rep["r"] >= 5 and rep["curve"][rep["r"]] >= 0.0
        assert all(isinstance(k_, int) for k_ in rep["curve"])
        # search still works at the tuned point
        ids, _ = c.index("t8").search(vecs[3], k=5)
        assert ids[0] == 3
        # hnsw indexes don't support tuning -> typed 400
        _post(port, "/index/create", {"name": "h", "dim": 16})
        with pytest.raises(MuninnRequestError) as ei:
            c.index("h").tune()
        assert ei.value.status == 400
    finally:
        srv.stop()


def test_engine_server_save_load_roundtrip(rng, tmp_path):
    """POST /index/save checkpoints a served index; /index/load restores
    it (kind from the manifest) with identical search results."""
    from muninn_tpu.client import EngineClient, MuninnRequestError

    srv = EngineServer()
    port = srv.start(port=0)
    try:
        _post(port, "/index/create",
              {"name": "v", "dim": 12, "metric": "cosine", "kind": "ivf",
               "cluster_size": 16})
        vecs = rng.standard_normal((200, 12)).astype(np.float32)
        _post(port, "/index/insert",
              {"name": "v", "ids": list(range(200)),
               "vectors": vecs.tolist()})
        c = EngineClient(f"http://127.0.0.1:{port}", retries=1, backoff=0.01)
        want_ids, want_d = c.index("v").search(vecs[:6], k=4)
        ck = str(tmp_path / "srv_ck")
        assert c.index("v").save(ck) == ck

        idx2 = c.load_index("v2", ck)
        got_ids, got_d = idx2.search(vecs[:6], k=4)
        assert got_ids == want_ids
        np.testing.assert_allclose(got_d, want_d, rtol=1e-5)

        # load over an existing name -> typed 400
        with pytest.raises(MuninnRequestError) as ei:
            c.load_index("v2", ck)
        assert ei.value.status == 400
        # load from a missing path -> typed 400
        with pytest.raises(MuninnRequestError) as ei:
            c.load_index("v3", str(tmp_path / "nope"))
        assert ei.value.status == 400
    finally:
        srv.stop()


def test_graph_create_collision_rejected():
    from muninn_tpu.client import EngineClient, MuninnRequestError

    srv = EngineServer()
    port = srv.start(port=0)
    try:
        c = EngineClient(f"http://127.0.0.1:{port}")
        c.create_graph("gg", src=[0, 1], dst=[1, 2])
        # a silent overwrite would serve another client's queries from
        # the wrong edge set (same contract as /index/create)
        with pytest.raises(MuninnRequestError):
            c.create_graph("gg", src=[5], dst=[6])
    finally:
        srv.stop()


def test_client_mutations_do_not_retry(monkeypatch):
    """Re-sending a timed-out mutation can re-apply a request the
    server already ran; only idempotent reads retry."""
    import urllib.request as ur

    from muninn_tpu.client import EngineClient, MuninnConnectionError

    c = EngineClient("http://127.0.0.1:1", timeout=0.05,
                     retries=3, backoff=0.01)
    calls = {"n": 0}

    def counting(req, timeout=None):
        calls["n"] += 1
        raise OSError("refused")

    monkeypatch.setattr(ur, "urlopen", counting)
    with pytest.raises(MuninnConnectionError):
        c._request("/index/insert", {"name": "x"})
    assert calls["n"] == 1  # no retries for a mutation
    calls["n"] = 0
    with pytest.raises(MuninnConnectionError):
        c._request("/index/search", {"name": "x"})
    assert calls["n"] == 4  # idempotent read retried


def test_remote_search_accepts_list_of_numpy_rows(rng):
    from muninn_tpu.client import EngineClient

    srv = EngineServer()
    port = srv.start(port=0)
    try:
        c = EngineClient(f"http://127.0.0.1:{port}")
        ix = c.create_index("npq", dim=8, metric="l2", kind="flat")
        x = np.arange(24, dtype=np.float32).reshape(3, 8)
        ix.insert([0, 1, 2], x)
        ids, _ = ix.search([x[0], x[2]], k=1)  # list of ndarray rows
        assert [row[0] for row in ids] == [0, 2]
    finally:
        srv.stop()


def test_server_stop_releases_socket():
    """stop() must server_close() — a leaked listener blocks rebinding
    the same port in-process."""
    srv = EngineServer()
    port = srv.start(port=0)
    srv.stop()
    srv2 = EngineServer()
    p2 = srv2.start(port=port)  # EADDRINUSE if the socket leaked
    assert p2 == port
    srv2.stop()


def test_concurrent_mixed_ops_consistency():
    """Concurrency hammer representative (8-thread x 25-op campaign ran
    clean): parallel insert/delete/search/dup-probe threads get only
    successes or TYPED errors, and the final index state equals the
    successful inserts minus deletes (the do_POST global lock contract)."""
    import threading

    from muninn_tpu.client import EngineClient, MuninnClientError

    dim = 8
    srv = EngineServer()
    port = srv.start(port=0)
    try:
        base = f"http://127.0.0.1:{port}"
        cli0 = EngineClient(base, retries=1, backoff=0.01)
        h0 = cli0.create_index("hammer", dim, metric="l2", kind="flat")
        errors, applied, deleted = [], {}, set()
        lock = threading.Lock()

        def worker(tid):
            r = np.random.default_rng(100 + tid)
            h = EngineClient(base, retries=1, backoff=0.01).index("hammer")
            for op_i in range(12):
                op = r.random()
                try:
                    if op < 0.5:
                        i = tid * 10000 + op_i
                        v = r.standard_normal((1, dim)).astype(np.float32)
                        h.insert(np.array([i]), v)
                        with lock:
                            applied[i] = v
                    elif op < 0.65:
                        with lock:
                            mine = [i for i in applied
                                    if i // 10000 == tid and i not in deleted]
                        if mine:
                            victim = int(r.choice(mine))
                            h.delete(np.array([victim]))
                            with lock:
                                deleted.add(victim)
                    elif op < 0.9:
                        ids, _ = h.search(
                            r.standard_normal((2, dim)).astype(np.float32), k=3)
                        assert np.asarray(ids).shape == (2, 3)
                    else:
                        with lock:
                            mine = [i for i in applied
                                    if i // 10000 == tid and i not in deleted]
                        if mine:
                            try:
                                h.insert(np.array([mine[0]]),
                                         r.standard_normal((1, dim)).astype(np.float32))
                                errors.append((tid, op_i, "dup accepted"))
                            except MuninnClientError:
                                pass
                except MuninnClientError:
                    pass
                except Exception as e:  # untyped = contract violation
                    errors.append((tid, op_i, f"{type(e).__name__}: {e}"))

        threads = [threading.Thread(target=worker, args=(t,)) for t in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:5]
        live = {i: v for i, v in applied.items() if i not in deleted}
        for i, v in list(live.items())[:15]:
            ids, _ = h0.search(v, k=1)
            assert int(np.ravel(ids)[0]) == i
        for i in list(deleted)[:10]:
            ids, _ = h0.search(applied[i], k=3)
            assert i not in np.ravel(np.asarray(ids)).tolist()
    finally:
        srv.stop()


def test_client_garbled_response_is_typed(monkeypatch):
    """A transport-corrupted 2xx body (broken proxy/middlebox) must
    surface as a typed MuninnConnectionError, not a raw JSONDecodeError
    — and must not retry mutations (the request may have been applied).
    Found by tools/soak/client_faults.py."""
    import io
    import urllib.request as ur

    from muninn_tpu.client import EngineClient, MuninnConnectionError

    class Garbled(io.BytesIO):
        def __init__(self):
            super().__init__(b"{definitely: not json")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            pass

    c = EngineClient("http://127.0.0.1:1", timeout=0.05,
                     retries=2, backoff=0.01)
    calls = {"n": 0}

    def garbling(req, timeout=None):
        calls["n"] += 1
        return Garbled()

    monkeypatch.setattr(ur, "urlopen", garbling)
    with pytest.raises(MuninnConnectionError, match="undecodable"):
        c._request("/index/insert", {"name": "x"})
    assert calls["n"] == 1  # mutation: no retry on a corrupt response
    calls["n"] = 0
    with pytest.raises(MuninnConnectionError, match="undecodable"):
        c._request("/index/search", {"name": "x"})
    assert calls["n"] == 3  # idempotent read retried


def test_client_fault_injection_representative():
    """Bounded representative of tools/soak/client_faults.py: one trial
    through the fault proxy (injected 500s, hangups, garbled bodies,
    delays) — typed errors only, no mutation replay, state == forwarded
    mutations."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "client_faults",
        pathlib.Path(__file__).resolve().parents[1]
        / "tools" / "soak" / "client_faults.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    errs = mod.one_trial(0)
    assert errs == [], errs


def test_search_coalescing_merges_concurrent_requests(rng):
    """N concurrent single-query searches share engine dispatches (the
    micro-batch window) and every caller still gets exactly its own
    rows — the concurrent-client contract of VERDICT r4 task #7."""
    import threading

    srv = EngineServer(coalesce_window=0.05)
    port = srv.start(port=0)
    try:
        n, d = 300, 16
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        _post(port, "/index/create",
              {"name": "c", "dim": d, "kind": "flat", "metric": "cosine"})
        _post(port, "/index/insert",
              {"name": "c", "ids": list(range(n)), "vectors": x.tolist()})

        n_clients = 24
        results = [None] * n_clients
        barrier = threading.Barrier(n_clients)

        def one(i):
            barrier.wait()
            st, r = _post(port, "/index/search",
                          {"name": "c", "queries": [x[i].tolist()], "k": 3})
            results[i] = (st, r)

        threads = [
            threading.Thread(target=one, args=(i,)) for i in range(n_clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)

        # every caller got ITS row back, correctly
        for i, (st, r) in enumerate(results):
            assert st == 200, r
            assert r["ids"][0][0] == i
            assert r["distances"][0][0] < 1e-5
        # and far fewer engine calls than requests were issued
        assert srv.coalescer.requests >= n_clients
        assert srv.coalescer.batches < n_clients / 2, (
            srv.coalescer.batches, srv.coalescer.requests,
        )
    finally:
        srv.stop()


def test_search_coalescing_validates_inputs_individually(rng):
    """A malformed request fails ITSELF with a 4xx; a concurrent valid
    request sharing the window is unaffected."""
    import threading

    srv = EngineServer(coalesce_window=0.05)
    port = srv.start(port=0)
    try:
        d = 8
        x = rng.standard_normal((32, d)).astype(np.float32)
        _post(port, "/index/create", {"name": "v", "dim": d, "kind": "flat"})
        _post(port, "/index/insert",
              {"name": "v", "ids": list(range(32)), "vectors": x.tolist()})

        out = {}

        def good():
            out["good"] = _post(port, "/index/search",
                                {"name": "v", "queries": [x[3].tolist()],
                                 "k": 2})

        def bad():
            out["bad"] = _post(port, "/index/search",
                               {"name": "v", "queries": [[1.0, 2.0]],
                                "k": 2})

        ts = [threading.Thread(target=good), threading.Thread(target=bad)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        st_g, r_g = out["good"]
        st_b, r_b = out["bad"]
        assert st_g == 200 and r_g["ids"][0][0] == 3
        assert st_b == 400 and "queries must be" in r_b["error"]
    finally:
        srv.stop()


def test_stats_and_list_indexes(rng):
    """GET /stats and /index/list (the catalog role): both SDK
    allowlists named these as idempotent retry targets, so they must
    actually exist and report the served objects."""
    from muninn_tpu.client import EngineClient

    srv = EngineServer()
    port = srv.start(port=0)
    try:
        c = EngineClient(f"http://127.0.0.1:{port}")
        assert c.list_indexes() == []
        x = rng.standard_normal((20, 8)).astype(np.float32)
        idx = c.create_index("cat", 8, kind="flat")
        idx.insert(list(range(20)), x.tolist())
        c.create_graph("g", src=["a"], dst=["b"])
        rows = c.list_indexes()
        assert rows == [{"name": "cat", "kind": "flat", "dim": 8,
                         "count": 20}]
        st = c.stats()
        assert st["indexes"] == rows
        assert st["graphs"] == [{"name": "g", "nodes": 2, "edges": 1}]
        assert "search_requests" in st
    finally:
        srv.stop()


def test_search_coalescing_merges_mixed_params(rng):
    """Round-4 VERDICT task #6: concurrent searches with DIFFERENT
    k/ef/nprobe against the same index share engine dispatches (pad to
    the window max, slice per member) — each caller still gets exactly
    its own rows at its own k, with correct top-1."""
    import threading

    srv = EngineServer(coalesce_window=0.05)
    port = srv.start(port=0)
    try:
        n, d = 400, 16
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        _post(port, "/index/create",
              {"name": "m", "dim": d, "kind": "ivf", "metric": "cosine",
               "cluster_size": 32, "nprobe": 4})
        _post(port, "/index/insert",
              {"name": "m", "ids": list(range(n)), "vectors": x.tolist()})

        n_clients = 18
        ks = [2 + (i % 7) for i in range(n_clients)]          # k in 2..8
        results = [None] * n_clients
        barrier = threading.Barrier(n_clients)

        def one(i):
            body = {"name": "m", "queries": [x[i].tolist()], "k": ks[i]}
            if i % 3 == 1:
                body["nprobe"] = 4 + (i % 5)                  # mixed nprobe
            barrier.wait()
            results[i] = _post(port, "/index/search", body)

        threads = [
            threading.Thread(target=one, args=(i,)) for i in range(n_clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)

        for i, (st, r) in enumerate(results):
            assert st == 200, r
            assert len(r["ids"][0]) == ks[i], (i, ks[i], r["ids"])  # own k
            assert r["ids"][0][0] == i                       # own row
            assert r["distances"][0][0] < 1e-3
        # mixed params still coalesce: far fewer engine calls than
        # requests (pre-fix, 7 distinct k values -> >= 7 buckets)
        assert srv.coalescer.batches < n_clients / 2, (
            srv.coalescer.batches, srv.coalescer.requests,
        )
    finally:
        srv.stop()


def test_engine_failure_is_500_not_400(rng, monkeypatch):
    """Regression (round-4 ADVICE): an engine failure inside the shared
    coalesced call must be a 5xx for every member — even when the
    underlying exception type is ValueError/KeyError/TypeError (which
    the handler maps to 400 for INPUT validation only)."""
    srv = EngineServer(coalesce_window=0.02)
    port = srv.start(port=0)
    try:
        d = 8
        x = rng.standard_normal((16, d)).astype(np.float32)
        _post(port, "/index/create", {"name": "f", "dim": d, "kind": "flat"})
        _post(port, "/index/insert",
              {"name": "f", "ids": list(range(16)), "vectors": x.tolist()})
        idx = srv.indexes["f"]

        def boom(*a, **k):
            raise ValueError("engine internal invariant violated")

        monkeypatch.setattr(type(idx), "search", boom)
        st, r = _post(port, "/index/search",
                      {"name": "f", "queries": [x[0].tolist()], "k": 2})
        assert st == 500, (st, r)
        assert "engine search failed" in r["error"]
        # the zero-window (direct) path honors the same contract
        srv.coalescer.window = 0.0
        st2, r2 = _post(port, "/index/search",
                        {"name": "f", "queries": [x[0].tolist()], "k": 2})
        assert st2 == 500, (st2, r2)
    finally:
        srv.stop()


def test_search_coalescing_with_concurrent_mutations(rng):
    """Searches coalescing while inserts/deletes land must never 5xx
    and must end consistent: the engine lock serializes the batched
    search dispatch against mutations, so every response reflects SOME
    consistent index state."""
    import threading

    srv = EngineServer(coalesce_window=0.02)
    port = srv.start(port=0)
    try:
        n, d = 256, 16
        x = rng.standard_normal((n + 64, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        _post(port, "/index/create",
              {"name": "m", "dim": d, "kind": "flat", "metric": "cosine"})
        _post(port, "/index/insert",
              {"name": "m", "ids": list(range(n)), "vectors": x[:n].tolist()})

        statuses: list[int] = []
        lock = threading.Lock()

        def searcher(i):
            for r in range(6):
                st, body = _post(port, "/index/search",
                                 {"name": "m",
                                  "queries": [x[(i * 7 + r) % n].tolist()],
                                  "k": 5})
                with lock:
                    statuses.append(st)

        def mutator():
            for w in range(4):
                st1, _ = _post(port, "/index/insert", {
                    "name": "m", "ids": list(range(n + w * 16, n + w * 16 + 16)),
                    "vectors": x[n + w * 16 : n + w * 16 + 16].tolist(),
                })
                st2, _ = _post(port, "/index/delete",
                               {"name": "m", "ids": [w * 3, w * 3 + 1]})
                with lock:
                    statuses.extend([st1, st2])

        threads = [threading.Thread(target=searcher, args=(i,))
                   for i in range(8)] + [threading.Thread(target=mutator)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert statuses and all(s == 200 for s in statuses), statuses
        # final state: all inserts + deletes applied
        st, r = _post(port, "/index/search",
                      {"name": "m", "queries": [x[n].tolist()], "k": 1})
        assert st == 200 and r["ids"][0][0] == n   # a late insert is live
    finally:
        srv.stop()
