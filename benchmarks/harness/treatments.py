"""Treatment implementations, one permutation per ``run`` call.

Covers the reference's treatment families (vss, graph traversal /
centrality / community, graph_vt CSR cache, node2vec, embed,
kg_extract, kg_resolve, kg_graphrag —
``/root/reference/benchmarks/harness/treatments/``)."""

from __future__ import annotations

import time

import numpy as np

from benchmarks.harness.core import _er_graph, treatment
from benchmarks.harness import prep as prep_mod


# ───────────────────────── vss ─────────────────────────


def _vss_grid(sizes):
    out = []
    for n in sizes:
        for engine in ("flat", "quantized", "hnsw", "ivf"):
            out.append({"engine": engine, "n": n, "dim": 128, "k": 10,
                        "queries": "heldout"})
        # OOD stress point (queries disjoint from corpus clusters):
        # recorded separately — the reference-comparable recall curve is
        # the held-out series (see core._heldout_queries)
        out.append({"engine": "hnsw", "n": n, "dim": 128, "k": 10,
                    "queries": "ood"})
        # dataset-shift comparison (the reference's ag_news vs
        # wealth_of_nations role): zipf-skewed cluster sizes — the hard
        # case for cluster-routing engines
        for engine in ("hnsw", "ivf"):
            out.append({"engine": engine, "n": n, "dim": 128, "k": 10,
                        "queries": "heldout", "dataset": "zipf"})
    # reference-published model dims at the reference's own Ns
    # (recall_models_ag_news.json: MiniLM 384-d @ 100..100k, BGE-Large
    # 1024-d @ 100/5k/50k) — fixed series, independent of --sizes
    for n in (100, 1000, 5000, 10000, 50000, 100000):
        out.append({"engine": "hnsw", "n": n, "dim": 384, "k": 10,
                    "queries": "heldout"})
    for n in (100, 5000, 50000):
        out.append({"engine": "hnsw", "n": n, "dim": 1024, "k": 10,
                    "queries": "heldout"})
    return out


def _drain(res):
    """One tiny host fetch on a (dists, slots) device result — closes a
    queue of async dispatches (bench.py's drain-once discipline)."""
    import jax.numpy as jnp

    float(jnp.asarray(res[0]).reshape(-1)[0].astype(jnp.float32))


def _queued_qps(idx, q, k, inner=4, **kw):
    """Queued-dispatch throughput: ``inner`` engine dispatches per host
    sync, so the ~30 ms tunnel round-trip amortizes over the queue
    instead of flooring every small-N batch at one RTT (bench.py
    methodology; the engine metric is batch throughput)."""
    _drain(idx.search_device(q, k=k, **kw))  # warm
    t0 = time.time()
    res = None
    for _ in range(inner):
        res = idx.search_device(q, k=k, **kw)
    _drain(res)
    return inner * len(q) / (time.time() - t0)


@treatment("vss", _vss_grid)
def run_vss(params, rng, emit):
    """Vector search: build + query throughput + recall for one engine
    at one corpus size (the reference's vss treatment compares engines
    across N, ``recall_models_ag_news.json``)."""
    from muninn_tpu.index.flat import FlatIndex, QuantizedFlatIndex
    from muninn_tpu.index.hnsw import HnswIndex

    n, dim, k = params["n"], params["dim"], params["k"]
    engine = params["engine"]
    x, q_heldout, q_ood = prep_mod.vss_data(
        rng, n, dim, dataset=params.get("dataset", "clustered")
    )
    q = q_heldout if params["queries"] == "heldout" else q_ood
    n_q = len(q)

    def _build():
        if engine == "flat":
            b = FlatIndex(dim, "cosine")
        elif engine == "quantized":
            b = QuantizedFlatIndex(dim, "cosine")
        elif engine == "ivf":
            from muninn_tpu.index.ivf import IvfIndex
            b = IvfIndex(dim, "cosine", capacity=max(2048, n * 2))
        else:
            b = HnswIndex(dim, "cosine", m=16, ef_construction=100,
                          wave_size=2048, capacity=max(2048, n * 2))
        b.insert(np.arange(n), x)
        if engine == "ivf" and b.centroids is None:
            b.rebuild()  # below the auto-build threshold at small n
        return b

    t0 = time.time()
    idx = _build()
    build_s = time.time() - t0
    # warm rebuild (same shapes, XLA cache hit): the steady-state rate
    # comparable to the reference's numbers — its C kernels were
    # compiled on the developer's machine, not inside the benchmark.
    # The cold number above still carries the honest first-build cost.
    t0 = time.time()
    _build()
    build_warm_s = time.time() - t0

    flat = FlatIndex(dim, "cosine")
    flat.insert(np.arange(n), x)
    tid, _ = flat.search(q, k=k)

    def _recall(a_ids):
        return float(np.mean([
            len(set(a[a >= 0]) & set(b[b >= 0])) / k
            for a, b in zip(a_ids, tid)
        ]))

    # base operating point for hnsw: ef_search=64 — the reference
    # HARNESS default (benchmarks/harness/common.py:42-46), which its
    # published recall curves use; the API default stays k*2 (the vtab
    # default)
    base_kw = {"ef_search": 64} if engine == "hnsw" else {}
    t0 = time.time()
    ids, _ = idx.search(q, k=k, **base_kw)  # warm + recall ids
    query_s = time.time() - t0
    qps = _queued_qps(idx, q, k, **base_kw)
    # persisted index size (the reference's db_size chart role):
    # checkpoint bytes on disk for the same corpus
    import shutil
    import tempfile
    from muninn_tpu.io import checkpoint as ckpt
    saver = {"flat": ckpt.save_flat, "quantized": ckpt.save_quantized,
             "ivf": ckpt.save_ivf, "hnsw": ckpt.save_hnsw}[engine]
    tmp = tempfile.mkdtemp(prefix="muninn_vss_db_")
    try:
        saver(idx, tmp)
        db_bytes = sum(
            p.stat().st_size
            for p in __import__("pathlib").Path(tmp).rglob("*")
            if p.is_file()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    emit(
        dict(params),
        {"build_s": build_s, "build_vec_per_s": n / build_s,
         "build_warm_s": build_warm_s,
         "build_warm_vec_per_s": n / build_warm_s,
         "query_qps": qps, "recall_at_k": _recall(ids),
         "db_bytes": db_bytes},
        build_s + build_warm_s + query_s,
    )
    if engine == "hnsw":
        # ef_search sweep -> the recall-QPS operating curve
        # (reference sweep space: efS in {10,50,100,200,400})
        for ef in (10, 16, 32, 64, 128):
            t0 = time.time()
            sids, _ = idx.search(q, k=k, ef_search=ef)  # warm + recall
            qs = time.time() - t0
            emit(
                {**params, "ef": ef},
                {"query_qps": _queued_qps(idx, q, k, ef_search=ef),
                 "recall_at_k": _recall(sids)},
                qs,
            )
    elif engine == "ivf":
        # nprobe sweep (the IVF ef_search analogue)
        for p in (2, 4, 8, 16):
            if p > idx.nlist:
                break
            t0 = time.time()
            sids, _ = idx.search(q, k=k, nprobe=p)  # warm + recall
            qs = time.time() - t0
            emit(
                {**params, "nprobe": p},
                {"query_qps": _queued_qps(idx, q, k, nprobe=p),
                 "recall_at_k": _recall(sids)},
                qs,
            )


def _vss_params_grid(sizes):
    # reference sweep space: M in {8,16,32,64} x efC in {100,200}
    # (benchmarks/harness/common.py:51-53) — fixed N above the
    # exact-small-N routing threshold so the graph path is measured
    return [
        {"engine": "hnsw", "n": 20000, "dim": 128, "k": 10,
         "m": m, "ef_construction": efc, "queries": "heldout"}
        for m in (8, 16, 32, 64)
        for efc in (100, 200)
    ]


@treatment("vss_params", _vss_params_grid)
def run_vss_params(params, rng, emit):
    """HNSW (M, ef_construction) parameter sweep: build rate, recall
    and queued-dispatch QPS at ef_search=64 for each point of the
    reference's published sweep space."""
    from muninn_tpu.index.flat import FlatIndex
    from muninn_tpu.index.hnsw import HnswIndex

    n, dim, k = params["n"], params["dim"], params["k"]
    x, q, _ = prep_mod.vss_data(rng, n, dim)
    t0 = time.time()
    idx = HnswIndex(dim, "cosine", m=params["m"],
                    ef_construction=params["ef_construction"],
                    wave_size=2048, capacity=max(2048, n * 2))
    idx.insert(np.arange(n), x)
    build_s = time.time() - t0

    flat = FlatIndex(dim, "cosine")
    flat.insert(np.arange(n), x)
    tid, _ = flat.search(q, k=k)
    ids, _ = idx.search(q, k=k, ef_search=64)
    recall = float(np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / k
        for a, b in zip(ids, tid)
    ]))
    emit(
        dict(params),
        {"build_s": build_s, "build_vec_per_s": n / build_s,
         "query_qps": _queued_qps(idx, q, k, ef_search=64),
         "recall_at_k": recall},
        build_s,
    )


# ───────────────────────── graph families ─────────────────────────


def _sized_grid(extra):
    def grid(sizes):
        return [{"n": n, **extra(n)} for n in sizes]

    return grid



def _timed_median(fn, budget_s: float = 0.6, max_reps: int = 5) -> float:
    """Median-of-repeats wall time for an op. One cold run always
    counts; fast ops repeat (warm) until ~budget_s or max_reps — the
    reference's published sub-ms graph numbers are warm medians, so
    one-shot cold timing at tiny N measures allocator/cache noise, not
    the engine. Sub-2ms ops widen to up to 25 reps (still inside the
    budget): at that scale a 5-rep median still carries 20-50%
    scheduler noise on this vCPU, which is bigger than the margins the
    head-to-head table is judged on."""
    times = []
    while len(times) < max_reps:
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
        if sum(times) >= budget_s and times:
            break
        if (
            len(times) == max_reps and max_reps < 25
            and sorted(times)[len(times) // 2] < 2e-3
        ):
            max_reps = 25
    times.sort()
    return times[len(times) // 2]


@treatment("graph_traversal", _sized_grid(lambda n: {"avg_deg": 5}))
def run_traversal(params, rng, emit):
    from muninn_tpu.graph import Graph

    n = params["n"]
    src, dst = _er_graph(rng, n, params["avg_deg"])
    g = Graph.from_edges(src.tolist(), dst.tolist())
    t0 = time.time(); g.host_csr("forward"); build_s = time.time() - t0
    rows = g.bfs(int(src[0]))
    bfs_s = _timed_median(lambda: g.bfs(int(src[0])))
    dfs_s = _timed_median(lambda: g.dfs(int(src[0])))
    sp_s = _timed_median(lambda: g.shortest_path(int(src[0]), int(dst[-1])))
    cc_s = _timed_median(g.connected_components)
    emit(
        dict(params),
        {"csr_build_ms": build_s * 1e3, "bfs_ms": bfs_s * 1e3,
         "dfs_ms": dfs_s * 1e3,
         "shortest_path_ms": sp_s * 1e3, "components_ms": cc_s * 1e3,
         "bfs_reached": len(rows)},
        build_s + bfs_s + dfs_s + sp_s + cc_s,
    )


@treatment(
    "graph_centrality",
    _sized_grid(lambda n: {"avg_deg": 5, "bc_sources": min(n, 64)}),
)
def run_centrality(params, rng, emit):
    from muninn_tpu.graph import Graph

    n = params["n"]
    src, dst = _er_graph(rng, n, params["avg_deg"])
    g = Graph.from_edges(src.tolist(), dst.tolist())
    pr_s = _timed_median(g.pagerank)
    dg_s = _timed_median(g.degree)
    bc_s = _timed_median(
        lambda: g.betweenness(sample_sources=params["bc_sources"]))
    # exact all-source betweenness + closeness only inside the
    # reference's published envelope (its charts stop at 10k and its
    # auto-approx threshold is 50k, so the published numbers ARE exact
    # — the sampled series above is not comparable to them)
    bx_s = (
        _timed_median(lambda: g.betweenness(), budget_s=0.0, max_reps=1)
        if n <= 10_000 else None
    )
    cl_s = _timed_median(g.closeness) if n <= 10_000 else None
    emit(
        dict(params),
        {"pagerank_ms": pr_s * 1e3, "degree_ms": dg_s * 1e3,
         "betweenness_ms": bc_s * 1e3,
         "betweenness_exact_ms": bx_s * 1e3 if bx_s is not None else None,
         "closeness_ms": cl_s * 1e3 if cl_s is not None else None},
        pr_s + dg_s + bc_s + (bx_s or 0.0) + (cl_s or 0.0),
    )


@treatment("graph_community", _sized_grid(lambda n: {"avg_deg": 8}))
def run_community(params, rng, emit):
    from muninn_tpu.graph import Graph

    n = params["n"]
    src, dst = _er_graph(rng, n, params["avg_deg"])
    g = Graph.from_edges(src.tolist(), dst.tolist())
    labels, q = g.leiden(seed=0)
    s = _timed_median(lambda: g.leiden(seed=0))
    emit(
        dict(params),
        {"leiden_ms": s * 1e3, "modularity": q,
         "communities": len(set(labels.values()))},
        s,
    )


@treatment(
    "graph_scale",
    # device-regime treatment: only emit permutations at sizes where
    # the device engine is the story (the CLI always passes --sizes, so
    # a fallback default here would be dead code — and running this at
    # n=1000 would measure pure tunnel-dispatch overhead, polluting
    # results.jsonl on a default `run`)
    lambda sizes: [
        {"n": n, "avg_deg": 10} for n in sizes if n >= 50_000
    ],
)
def run_graph_scale(params, rng, emit):
    """Device-resident scale demo: the regime one decade past the host
    C++ engine's comfort zone. Edges are generated ON DEVICE (the TPU
    tunnel uploads at ~2 MB/s — shipping a 100M-edge COO would take ~7
    minutes and measure the tunnel), the CSR is built by a device
    stable sort (``Graph.from_device_edges``), and each analytics op is
    timed end-to-end through the public API (device fixpoint + the
    one host download its array result costs). Ops run in
    cheapest-first order and emit partials, so a device OOM on the
    largest op still records the rest."""
    import os

    import jax
    import jax.numpy as jnp

    from muninn_tpu.graph import Graph

    # Refuse the silent CPU fallback: when the axon plugin fails to
    # initialize (tunnel down), JAX falls back to backend='cpu' and this
    # treatment would record host timings as device rows. Fail loudly
    # instead (MUNINN_GRAPH_SCALE_ALLOW_CPU=1 opts into CPU for tests).
    if jax.default_backend() == "cpu" and not os.environ.get(
        "MUNINN_GRAPH_SCALE_ALLOW_CPU"
    ):
        raise RuntimeError(
            "graph_scale is a device-regime treatment but JAX resolved "
            "backend='cpu' (axon init failure?). Refusing to record CPU "
            "timings as device rows; set MUNINN_GRAPH_SCALE_ALLOW_CPU=1 "
            "to override."
        )

    n = params["n"]
    e = n * params["avg_deg"]
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    ks, kd = jax.random.split(key)
    src = jax.random.randint(ks, (e,), 0, n, jnp.int32)
    dst = jax.random.randint(kd, (e,), 0, n, jnp.int32)
    int(dst[0])  # tiny host fetch: block_until_ready lies here (CLAUDE.md)

    g = Graph.from_device_edges(src, dst, num_nodes=n)
    metrics: dict = {"edges": e}
    t0 = time.time()
    # pagerank pulls over the reverse CSR and reads degrees off the
    # forward one; building both IS the device build cost
    g.csr("forward")
    g.csr("reverse")
    build_s = time.time() - t0
    metrics["csr_build_s"] = build_s
    metrics["csr_build_medge_per_s"] = 2 * e / build_s / 1e6
    total = build_s
    # A TPU worker fault kills every op after it in this process, so
    # the op most likely to fault at the largest sizes (BFS's seg_min
    # over [E] faulted the worker at 100M edges) runs LAST — pagerank
    # and components record their rows first.
    try:
        t0 = time.time()
        rank = g.pagerank(iterations=20, backend="device", as_array=True)
        pr_s = time.time() - t0
        metrics["pagerank20_s"] = pr_s
        metrics["pagerank_medge_iter_per_s"] = 20 * e / pr_s / 1e6
        metrics["pagerank_sum"] = float(rank.sum())  # ~1.0 sanity
        total += pr_s

        t0 = time.time()
        labels = g.connected_components(backend="device", as_array=True)
        cc_s = time.time() - t0
        metrics["components_s"] = cc_s
        metrics["n_components"] = int(labels.max()) + 1
        total += cc_s

        t0 = time.time()
        depth, _ = g.bfs(0, as_array=True, backend="device")
        bfs_s = time.time() - t0
        metrics["bfs_s"] = bfs_s
        metrics["bfs_reached"] = int((depth < 2**30).sum())
        total += bfs_s
    except Exception as exc:  # partial results still emit
        metrics["error"] = f"{type(exc).__name__}: {exc}"
    # Stamp the REAL resolved backend, not an aspirational "device":
    # under MUNINN_GRAPH_SCALE_ALLOW_CPU the rows must say "cpu" so
    # they can never be mistaken for device measurements.
    backend = jax.default_backend()
    emit(
        {**params, "backend": "device" if backend != "cpu" else "cpu"},
        metrics,
        total,
    )


@treatment("graph_vt", _sized_grid(lambda n: {"avg_deg": 5}))
def run_graph_vt(params, rng, emit):
    """CSR cache build + incremental delta (the reference's graph_vt
    treatment over CSR strategies)."""
    from muninn_tpu.graph.adjacency import GraphCache

    import shutil
    import tempfile

    n = params["n"]
    src, dst = _er_graph(rng, n, params["avg_deg"])
    t0 = time.time()
    gc = GraphCache.from_edges(src.tolist(), dst.tolist())
    full_s = time.time() - t0
    # trigger-role overhead: the delta append alone (the reference's
    # graph_vt_trigger chart measures its AFTER-INSERT trigger cost)
    t0 = time.time()
    gc.add_edges(src[:10].tolist(), dst[:10].tolist())
    trig_s = time.time() - t0
    t0 = time.time(); gc.graph(); inc_s = time.time() - t0
    # explicit full rebuild after a small delta (graph_vt_rebuild's
    # full-rebuild series)
    gc.add_edges(src[10:20].tolist(), dst[10:20].tolist())
    t0 = time.time(); gc.rebuild(); reb_s = time.time() - t0
    # persisted size + save time (graph_vt_disk's CSR series role)
    tmp = tempfile.mkdtemp(prefix="muninn_gvt_")
    try:
        t0 = time.time(); gc.save(tmp); save_s = time.time() - t0
        disk = sum(
            p.stat().st_size
            for p in __import__("pathlib").Path(tmp).rglob("*")
            if p.is_file()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    emit(
        {**params, "edges": len(src)},
        {"full_build_ms": full_s * 1e3, "incremental_ms": inc_s * 1e3,
         "trigger_ms": trig_s * 1e3, "rebuild_ms": reb_s * 1e3,
         "save_ms": save_s * 1e3, "disk_bytes": disk},
        full_s + inc_s + trig_s + reb_s + save_s,
    )


@treatment(
    "node2vec",
    lambda sizes: [{"n": min(n, 2000), "dim": 32} for n in
                   sorted({min(s, 2000) for s in sizes})],
)
def run_node2vec(params, rng, emit):
    from muninn_tpu.graph import Graph
    from muninn_tpu.models.node2vec import node2vec_train

    n = params["n"]
    src, dst = _er_graph(rng, n, 5)
    g = Graph.from_edges(src.tolist(), dst.tolist())
    t0 = time.time()
    ids, _ = node2vec_train(
        g, dim=params["dim"], num_walks=2, walk_length=20, epochs=1,
        walk_batch=1024, sgns_chunk=256,
    )
    s = time.time() - t0
    emit(dict(params), {"train_s": s, "nodes_per_s": len(ids) / s}, s)


# ───────────────────────── text / KG ─────────────────────────


@treatment(
    "embed", lambda sizes: [
        {"n_texts": 2000, "dim": 128, "backend": "hash"},
        {"n_texts": 2048, "dim": 384, "backend": "flax-minilm-shape"},
        {"n_texts": 2048, "dim": 768, "backend": "flax-mpnet-shape"},
    ]
)
def run_embed(params, rng, emit):
    """Text embedding throughput. backend=hash is the deterministic
    pipeline-exercise backend; backend=flax-minilm-shape loads a
    synthesized 6L/384d/30k-vocab MiniLM-geometry Flax encoder
    (``llm_ckpt.py``) and measures the real jitted MXU embed path —
    the analogue of the reference's GGUF model sweep
    (``benchmarks/harness/treatments/embed.py`` role). Shapes drive
    throughput; weights are random, so only speed is meaningful."""
    if params["backend"].startswith("flax"):
        from benchmarks.harness.llm_ckpt import ensure_checkpoint
        from muninn_tpu.models.embed import FlaxEmbedModel

        path = ensure_checkpoint(params["backend"].removeprefix("flax-"))
        t0 = time.time()
        model = FlaxEmbedModel(path, batch_size=256)
        load_s = time.time() - t0
        words = ["korital", "bamu", "zoqua", "rivin", "ethal", "orsa",
                 "lidro", "nepix", "ulgra", "tenko"]
        texts = [
            " ".join(words[(i + j) % len(words)] for j in range(48))
            for i in range(params["n_texts"])
        ]
        n_tokens = sum(len(ids) for ids in model._hf_tok(texts)["input_ids"])
        model.embed(texts[:256])  # warm: compile at the bucketed shape
        t0 = time.time()
        vecs = model.embed(texts)
        s = time.time() - t0
        emit(
            dict(params),
            {"texts_per_s": len(texts) / s,
             "tokens_per_s": n_tokens / s,
             "embed_s": s, "load_s": load_s,
             "unit_norm": bool(np.allclose(
                 np.linalg.norm(vecs, axis=1), 1, atol=1e-3))},
            s,
        )
        return
    from muninn_tpu.models.embed import HashEmbedModel

    model = HashEmbedModel(dim=params["dim"])
    texts = [
        f"document number {i} about topic {i % 50}"
        for i in range(params["n_texts"])
    ]
    t0 = time.time()
    vecs = model.embed(texts)
    s = time.time() - t0
    emit(
        dict(params),
        {"texts_per_s": len(texts) / s, "embed_s": s,
         "unit_norm": bool(np.allclose(
             np.linalg.norm(vecs, axis=1), 1, atol=1e-4))},
        s,
    )


@treatment("kg_extract", lambda sizes: [
    {"n_docs": 200, "backend": "echo"},
    {"n_docs": 32, "max_tokens": 64, "backend": "flax-gpt2s-shape"},
    {"n_docs": 128, "max_tokens": 64, "backend": "flax-gpt2s-shape"},
])
def run_kg_extract(params, rng, emit):
    """NER/RE extraction throughput over the chat backend.

    backend=echo measures the extraction pipeline with the
    deterministic dummy; backend=flax-gpt2s-shape loads a synthesized
    12L/768d GPT-2-small-geometry decoder (``llm_ckpt.py``) and
    measures GRAMMAR-CONSTRAINED decode tokens/s through the real
    single-scan engine (``models/chat.py:_grammar_greedy_decode``) —
    the reference role is llama_chat.c's batched GBNF decode. The
    fixed-length scan runs every step for the whole batch, so
    B * max_tokens / wall is the exact engine rate. Random weights:
    throughput only, no quality reading."""
    if params["backend"].startswith("flax"):
        from benchmarks.harness.llm_ckpt import ensure_checkpoint
        from muninn_tpu.models.chat import FlaxChatModel
        from muninn_tpu.text.grammar import GRAMMAR_NER_RE

        path = ensure_checkpoint(params["backend"].removeprefix("flax-"))
        t0 = time.time()
        m = FlaxChatModel(path)
        load_s = time.time() - t0
        b, mt = params["n_docs"], params["max_tokens"]
        docs = [
            f"Person{i} works at Company{i % 20} in City{i % 7}."
            for i in range(b)
        ]
        m.generate_batch(docs, grammar=GRAMMAR_NER_RE, max_tokens=mt)  # warm
        t0 = time.time()
        outs = m.generate_batch(docs, grammar=GRAMMAR_NER_RE, max_tokens=mt)
        s = time.time() - t0
        emit(
            dict(params),
            {"decode_tokens_per_s": b * mt / s,
             "docs_per_s": b / s, "decode_s": s, "load_s": load_s,
             "outputs_nonempty": sum(1 for o in outs if o.strip())},
            s,
        )
        return
    from muninn_tpu.models.chat import load_chat_model
    from muninn_tpu.models.registry import registry
    from muninn_tpu.text import extract_ner_re_batch

    if "harness-chat" not in registry.names():
        load_chat_model("harness-chat")
    # lowercase verbs: capitalized connectives would merge adjacent
    # gold spans into one (the extractor treats consecutive capitalized
    # words as one entity, like the reference's unsupervised prompt)
    docs, gold = [], []
    for i in range(params["n_docs"]):
        ents = (f"Person{i}", f"Company{i % 20}", f"City{i % 7}")
        docs.append(f"{ents[0]} works at {ents[1]} in {ents[2]}.")
        gold.append(set(ents))
    t0 = time.time()
    outs = extract_ner_re_batch("harness-chat", docs)
    s = time.time() - t0
    # micro entity P/R/F1 vs gold (reference kg_metrics NER role)
    preds = [{e["name"] for e in o["entities"]} for o in outs]
    tp = sum(len(p & g) for p, g in zip(preds, gold))
    np_, ng = sum(map(len, preds)), sum(map(len, gold))
    prec = tp / np_ if np_ else 0.0
    rec = tp / ng if ng else 0.0
    emit(
        dict(params),
        {"docs_per_s": len(docs) / s,
         "entities": np_,
         "relations": sum(len(o["relations"]) for o in outs),
         "entity_precision": prec, "entity_recall": rec,
         "entity_f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0},
        s,
    )


@treatment("kg_re", lambda sizes: [{"n_docs": 200, "backend": "echo"}])
def run_kg_re(params, rng, emit):
    """Relation-extraction quality + throughput: micro precision /
    recall / F1 of extracted (head, relation, tail) triples against the
    docs' gold triples (the reference's dedicated kg_re treatment,
    ``benchmarks/harness/treatments/kg_re.py`` role — distinct from
    kg_extract, which measures the joint NER+RE surface's throughput)."""
    from muninn_tpu.models.chat import load_chat_model
    from muninn_tpu.models.registry import registry
    from muninn_tpu.text import extract_relations

    if "harness-chat" not in registry.names():
        load_chat_model("harness-chat")
    docs, gold = [], []
    for i in range(params["n_docs"]):
        h, t, p = f"Firm{i}", f"Unit{i % 31}", f"City{i % 7}"
        docs.append(f"{h} acquired {t} based in {p}.")
        gold.append({(h, "acquired", t), (t, "based in", p)})
    t0 = time.time()
    preds = [
        {
            (r["head"], r["relation"], r["tail"])
            for r in extract_relations("harness-chat", d)["relations"]
        }
        for d in docs
    ]
    s = time.time() - t0
    tp = sum(len(p & g) for p, g in zip(preds, gold))
    np_, ng = sum(map(len, preds)), sum(map(len, gold))
    prec = tp / np_ if np_ else 0.0
    rec = tp / ng if ng else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    emit(
        dict(params),
        {"docs_per_s": len(docs) / s, "triple_precision": prec,
         "triple_recall": rec, "triple_f1": f1},
        s,
    )


@treatment(
    "kg_resolve",
    lambda sizes: [{"n_entities": 3 * max(n // 3, 100)} for n in sizes],
)
def run_kg_resolve(params, rng, emit):
    """Entity-resolution cascade end to end, scored against the
    generator's KNOWN clusters (B-Cubed + pairwise F1, ``er/metrics``).

    Blocking index scales with the corpus (round-4 VERDICT task #8 —
    ER at 100k+ entities must not fall back to per-entity loops):
    exact FlatIndex below 30k entities, IvfIndex blocking above (built
    once, probed in ONE batched search for all entities).
    """
    from muninn_tpu.models.embed import TfidfHashEmbedModel
    from muninn_tpu.index.flat import FlatIndex
    from muninn_tpu.index.ivf import IvfIndex
    from muninn_tpu.er import Entity, resolve_entities
    from muninn_tpu.er.metrics import bcubed_f1, pairwise_f1

    n_base = params["n_entities"] // 3
    names = prep_mod.er_names(n_base)
    ents = [Entity(id=str(i), name=nm) for i, nm in enumerate(names)]
    # TF-IDF blocking (corpus-fit): plain bag-of-words hash embeddings
    # rank candidates by shared-token count, so the corpus-wide
    # 'Holdings' token crowds true variants out of the neighborhood at
    # 10k+ entities (measured round 5: merge rate 0.33 at 10k, B-Cubed
    # F1 0.29 at 33k; TF-IDF restores merge 1.0 / F1 0.999)
    model = TfidfHashEmbedModel(dim=96, ngram=3).fit(names)
    vecs = model.embed(names)
    big = params["n_entities"] > 30_000
    t0 = time.time()
    if big:
        idx = IvfIndex(96, "cosine", cluster_size=256, nprobe=16,
                       rescore_r=32, seed=0)
        idx.insert(np.arange(len(names)), vecs)
        idx.rebuild()
    else:
        idx = FlatIndex(96, "cosine")
        idx.insert(np.arange(len(names)), vecs)
    build_s = time.time() - t0
    # blocker width scales with corpus density: at 30k+ entities the
    # k=6 neighborhood fills with names sharing 2/3 tokens and crowds
    # out the true variants (measured: merge rate 0.466 at k=6 vs
    # 0.973 at k=12 on 30k entities; 0.062 at 99k)
    k = 6 if params["n_entities"] <= 10_000 else 12
    t0 = time.time()
    # dist_threshold 0.15 (match score >= 0.85): the corpus shares
    # rare tokens across DISTINCT bases, so the lax 0.45 of the
    # round-3 treatment transitively merged whole neighborhoods
    # (B-Cubed precision 0.07 at 900 entities once measured — the
    # triple-merge oracle alone couldn't see it)
    res = resolve_entities(ents, idx, k=k, dist_threshold=0.15, jw_weight=0.7)
    s = time.time() - t0
    clusters = res["clusters"]
    good = sum(
        1 for i in range(n_base)
        if clusters[str(i)] == clusters[str(i + n_base)]
        and clusters[str(i)] == clusters[str(i + 2 * n_base)]
    )
    gold = {str(i): i % n_base for i in range(len(names))}
    bc = bcubed_f1(clusters, gold)
    pw = pairwise_f1(clusters, gold)
    emit(
        dict(params),
        {"resolve_s": s, "entities_per_s": len(names) / s,
         "build_s": build_s, "blocker": "ivf" if big else "flat",
         "triple_merge_rate": good / n_base, "blocker_k": k,
         "bcubed_f1": bc["f1"], "bcubed_precision": bc["precision"],
         "bcubed_recall": bc["recall"], "pairwise_f1": pw["f1"]},
        s,
    )


@treatment("kg_graphrag", lambda sizes: [{"n_docs": 100}])
def run_kg_graphrag(params, rng, emit):
    """End-to-end GraphRAG: extract -> graph -> Leiden -> labels ->
    embed -> community-aware retrieval (reference kg_graphrag)."""
    from muninn_tpu.graph import Graph
    from muninn_tpu.models.chat import load_chat_model
    from muninn_tpu.models.embed import HashEmbedModel
    from muninn_tpu.models.registry import registry
    from muninn_tpu.index.flat import FlatIndex
    from muninn_tpu.text import extract_ner_re_batch, label_groups

    if "harness-chat" not in registry.names():
        load_chat_model("harness-chat")
    docs = [
        f"Alice{i} works at Acme{i % 10} in Springfield{i % 4}."
        for i in range(params["n_docs"])
    ]
    t0 = time.time()
    outs = extract_ner_re_batch("harness-chat", docs)
    src = [r["head"] for o in outs for r in o["relations"]]
    dst = [r["tail"] for o in outs for r in o["relations"]]
    g = Graph.from_edges(src, dst)
    labels, q = g.leiden(seed=0)
    members = {}
    for node, comm in labels.items():
        members.setdefault(comm, []).append(node)
    named = label_groups("harness-chat", members)
    model = HashEmbedModel(dim=64)
    ents = list(labels)
    idx = FlatIndex(64, "cosine")
    idx.insert(np.arange(len(ents)), model.embed(ents))
    ids, _ = idx.search(model.embed(["Acme3"]), k=5)
    s_total = time.time() - t0
    emit(
        dict(params),
        {"pipeline_s": s_total, "communities": len(members),
         "modularity": q, "labeled": len(named),
         "retrieved": int((np.asarray(ids) >= 0).sum())},
        s_total,
    )
