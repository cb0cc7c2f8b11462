"""Treatment-pattern benchmark harness.

Mirrors the reference's ``benchmarks/harness`` design
(``benchmarks/harness/README.md``): a registry of treatment x
permutation cells, each with setup/run/teardown, wall-time + memory
accounting, JSONL records. Treatments cover the same families: vss
(vector search), graph traversal, centrality, community, graph_vt (CSR
build), node2vec.

Usage:
    python -m benchmarks.harness list
    python -m benchmarks.harness run [treatment ...] [--out results.jsonl]
    python -m benchmarks.harness run vss --sizes 1000,10000
    python -m benchmarks.harness analyse results.jsonl

``analyse`` regenerates Plotly figure JSONs under ``benchmarks/charts/``
and markdown pages under ``docs/benchmarks/`` (the reference's committed
chart + rendered-doc pipeline, ``benchmarks/harness/README.md:177-222``).
"""

from __future__ import annotations

import argparse
import json
import platform
import resource
import sys
import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np


@dataclass
class Record:
    treatment: str
    permutation: dict
    metrics: dict
    wall_s: float
    peak_rss_mb: float
    platform: str = field(default_factory=lambda: f"{platform.system()}-{platform.machine()}".lower())
    ts: float = field(default_factory=time.time)


REGISTRY: dict[str, Callable] = {}


def treatment(name):
    def deco(fn):
        REGISTRY[name] = fn
        return fn
    return deco


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _emit(out, rec: Record):
    line = json.dumps(rec.__dict__)
    print(line)
    if out:
        out.write(line + "\n")
        out.flush()


def _clustered(rng, n, dim):
    c = rng.standard_normal((max(n // 100, 4), dim)).astype(np.float32)
    x = c[rng.integers(0, len(c), n)] + 0.3 * rng.standard_normal((n, dim)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def _er_graph(rng, n, avg_deg):
    e = n * avg_deg
    return rng.integers(0, n, e), rng.integers(0, n, e)


# ───────────────────────── treatments ─────────────────────────


@treatment("vss")
def run_vss(out, sizes, rng):
    """Vector search: build + query throughput + recall, flat vs hnsw
    (the reference's vss treatment compares 5 engines)."""
    from muninn_tpu.index.flat import FlatIndex, QuantizedFlatIndex
    from muninn_tpu.index.hnsw import HnswIndex

    dim, k, n_q = 128, 10, 256
    for n in sizes:
        x = _clustered(rng, n, dim)
        q = _clustered(rng, n_q, dim)
        for engine in ("flat", "quantized", "hnsw"):
            t0 = time.time()
            if engine == "flat":
                idx = FlatIndex(dim, "cosine")
                idx.insert(np.arange(n), x)
            elif engine == "quantized":
                idx = QuantizedFlatIndex(dim, "cosine")
                idx.insert(np.arange(n), x)
            else:
                idx = HnswIndex(dim, "cosine", m=16, ef_construction=100,
                                wave_size=2048, capacity=max(2048, n * 2))
                idx.insert(np.arange(n), x)
            build_s = time.time() - t0
            idx.search(q, k=k)  # warm
            t0 = time.time()
            ids, _ = idx.search(q, k=k)
            query_s = time.time() - t0
            flat = FlatIndex(dim, "cosine")
            flat.insert(np.arange(n), x)
            tid, _ = flat.search(q, k=k)

            def _recall(a_ids):
                return float(np.mean([
                    len(set(a[a >= 0]) & set(b[b >= 0])) / k
                    for a, b in zip(a_ids, tid)
                ]))

            _emit(out, Record(
                "vss", {"engine": engine, "n": n, "dim": dim, "k": k},
                {"build_s": build_s, "build_vec_per_s": n / build_s,
                 "query_qps": n_q / query_s, "recall_at_k": _recall(ids)},
                build_s + query_s, _rss_mb(),
            ))
            if engine == "hnsw":
                # ef_search sweep -> the recall-QPS operating curve
                # (reference sweep space: efS in {10,50,100,200,400})
                for ef in (10, 16, 32, 64, 128):
                    idx.search(q, k=k, ef_search=ef)  # warm
                    t0 = time.time()
                    sids, _ = idx.search(q, k=k, ef_search=ef)
                    qs = time.time() - t0
                    _emit(out, Record(
                        "vss",
                        {"engine": "hnsw", "n": n, "dim": dim, "k": k, "ef": ef},
                        {"query_qps": n_q / qs, "recall_at_k": _recall(sids)},
                        qs, _rss_mb(),
                    ))


@treatment("graph_traversal")
def run_traversal(out, sizes, rng):
    from muninn_tpu.graph import Graph

    for n in sizes:
        src, dst = _er_graph(rng, n, 5)
        g = Graph.from_edges(src.tolist(), dst.tolist())
        t0 = time.time(); g.csr("forward"); build_s = time.time() - t0
        t0 = time.time(); rows = g.bfs(int(src[0])); bfs_s = time.time() - t0
        t0 = time.time(); path, _ = g.shortest_path(int(src[0]), int(dst[-1])); sp_s = time.time() - t0
        t0 = time.time(); comp = g.connected_components(); cc_s = time.time() - t0
        _emit(out, Record(
            "graph_traversal", {"n": n, "avg_deg": 5},
            {"csr_build_ms": build_s * 1e3, "bfs_ms": bfs_s * 1e3,
             "shortest_path_ms": sp_s * 1e3, "components_ms": cc_s * 1e3,
             "bfs_reached": len(rows)},
            build_s + bfs_s + sp_s + cc_s, _rss_mb(),
        ))


@treatment("graph_centrality")
def run_centrality(out, sizes, rng):
    from muninn_tpu.graph import Graph

    for n in sizes:
        src, dst = _er_graph(rng, n, 5)
        g = Graph.from_edges(src.tolist(), dst.tolist())
        t0 = time.time(); g.pagerank(); pr_s = time.time() - t0
        t0 = time.time(); g.degree(); dg_s = time.time() - t0
        samp = min(n, 64)
        t0 = time.time(); g.betweenness(sample_sources=samp); bc_s = time.time() - t0
        _emit(out, Record(
            "graph_centrality", {"n": n, "avg_deg": 5, "bc_sources": samp},
            {"pagerank_ms": pr_s * 1e3, "degree_ms": dg_s * 1e3,
             "betweenness_ms": bc_s * 1e3},
            pr_s + dg_s + bc_s, _rss_mb(),
        ))


@treatment("graph_community")
def run_community(out, sizes, rng):
    from muninn_tpu.graph import Graph

    for n in sizes:
        src, dst = _er_graph(rng, n, 8)
        g = Graph.from_edges(src.tolist(), dst.tolist())
        t0 = time.time(); labels, q = g.leiden(seed=0); s = time.time() - t0
        _emit(out, Record(
            "graph_community", {"n": n, "avg_deg": 8},
            {"leiden_ms": s * 1e3, "modularity": q,
             "communities": len(set(labels.values()))},
            s, _rss_mb(),
        ))


@treatment("graph_vt")
def run_graph_vt(out, sizes, rng):
    """CSR cache build + incremental delta (the reference's graph_vt
    treatment over CSR strategies)."""
    from muninn_tpu.graph.adjacency import GraphCache

    for n in sizes:
        src, dst = _er_graph(rng, n, 5)
        t0 = time.time()
        gc = GraphCache.from_edges(src.tolist(), dst.tolist())
        full_s = time.time() - t0
        gc.add_edges(src[:10].tolist(), dst[:10].tolist())
        t0 = time.time(); gc.graph(); inc_s = time.time() - t0
        _emit(out, Record(
            "graph_vt", {"n": n, "edges": len(src)},
            {"full_build_ms": full_s * 1e3, "incremental_ms": inc_s * 1e3},
            full_s + inc_s, _rss_mb(),
        ))


@treatment("node2vec")
def run_node2vec(out, sizes, rng):
    from muninn_tpu.graph import Graph
    from muninn_tpu.models.node2vec import node2vec_train

    for n in sizes:
        n = min(n, 2000)  # training scale for harness runs
        src, dst = _er_graph(rng, n, 5)
        g = Graph.from_edges(src.tolist(), dst.tolist())
        t0 = time.time()
        ids, emb = node2vec_train(
            g, dim=32, num_walks=2, walk_length=20, epochs=1,
            walk_batch=1024, sgns_chunk=256,
        )
        s = time.time() - t0
        _emit(out, Record(
            "node2vec", {"n": n, "dim": 32},
            {"train_s": s, "nodes_per_s": len(ids) / s},
            s, _rss_mb(),
        ))


@treatment("embed")
def run_embed(out, sizes, rng):
    """Text embedding throughput (the reference's embed treatment runs
    GGUF models; here the deterministic backend exercises the same
    pipeline, and a real Flax encoder can be swapped via path=)."""
    from muninn_tpu.models.embed import HashEmbedModel

    model = HashEmbedModel(dim=128)
    texts = [f"document number {i} about topic {i % 50}" for i in range(2000)]
    t0 = time.time()
    vecs = model.embed(texts)
    s = time.time() - t0
    _emit(out, Record(
        "embed", {"n_texts": len(texts), "dim": 128, "backend": "hash"},
        {"texts_per_s": len(texts) / s, "embed_s": s,
         "unit_norm": bool(np.allclose(np.linalg.norm(vecs, axis=1), 1, atol=1e-4))},
        s, _rss_mb(),
    ))


@treatment("kg_extract")
def run_kg_extract(out, sizes, rng):
    """NER/RE extraction throughput over the chat backend."""
    from muninn_tpu.models.chat import load_chat_model
    from muninn_tpu.models.registry import registry
    from muninn_tpu.text import extract_ner_re_batch

    if "harness-chat" not in registry.names():
        load_chat_model("harness-chat")
    docs = [
        f"Person{i} Works at Company{i % 20} in City{i % 7}."
        for i in range(200)
    ]
    t0 = time.time()
    outs = extract_ner_re_batch("harness-chat", docs)
    s = time.time() - t0
    ents = sum(len(o["entities"]) for o in outs)
    rels = sum(len(o["relations"]) for o in outs)
    _emit(out, Record(
        "kg_extract", {"n_docs": len(docs), "backend": "echo"},
        {"docs_per_s": len(docs) / s, "entities": ents, "relations": rels},
        s, _rss_mb(),
    ))


@treatment("kg_resolve")
def run_kg_resolve(out, sizes, rng):
    """Entity-resolution cascade end to end."""
    from muninn_tpu.models.embed import HashEmbedModel
    from muninn_tpu.index.flat import FlatIndex
    from muninn_tpu.er import Entity, resolve_entities

    n_base = 300
    # distinct random company names (so only true variants are similar)
    syll = ["zor", "mak", "tel", "vin", "qua", "rex", "bol", "nim",
            "gar", "plu", "sev", "tro", "wik", "yam", "dex", "cor"]
    def mk(i):
        r = np.random.default_rng(i)
        return ("".join(r.choice(syll, 3)).capitalize()
                + " " + "".join(r.choice(syll, 2)).capitalize())
    base = [f"{mk(i)} Holdings" for i in range(n_base)]
    variants = [b.upper() for b in base] + [b.replace(" Holdings", " Hldgs") for b in base]
    names = base + variants
    ents = [Entity(id=str(i), name=n) for i, n in enumerate(names)]
    model = HashEmbedModel(dim=96)
    idx = FlatIndex(96, "cosine")
    idx.insert(np.arange(len(names)), model.embed(names))
    t0 = time.time()
    res = resolve_entities(ents, idx, k=6, dist_threshold=0.45, jw_weight=0.7)
    s = time.time() - t0
    # quality: each base name should cluster with its two variants
    clusters = res["clusters"]
    good = sum(
        1 for i in range(n_base)
        if clusters[str(i)] == clusters[str(i + n_base)]
        and clusters[str(i)] == clusters[str(i + 2 * n_base)]
    )
    _emit(out, Record(
        "kg_resolve", {"n_entities": len(names)},
        {"resolve_s": s, "entities_per_s": len(names) / s,
         "triple_merge_rate": good / n_base},
        s, _rss_mb(),
    ))


@treatment("kg_graphrag")
def run_kg_graphrag(out, sizes, rng):
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
        f"Alice{i} Works at Acme{i % 10} in Springfield{i % 4}."
        for i in range(100)
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
    _emit(out, Record(
        "kg_graphrag", {"n_docs": len(docs)},
        {"pipeline_s": s_total, "communities": len(members),
         "modularity": q, "labeled": len(named),
         "retrieved": int((np.asarray(ids) >= 0).sum())},
        s_total, _rss_mb(),
    ))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=["list", "run", "analyse"])
    ap.add_argument("treatments", nargs="*", default=[])
    ap.add_argument("--sizes", default="1000,5000")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--charts-dir", default="benchmarks/charts")
    ap.add_argument("--docs-dir", default="docs/benchmarks")
    args = ap.parse_args(argv)

    if args.command == "list":
        for name in REGISTRY:
            print(name)
        return

    if args.command == "analyse":
        from benchmarks.charts import analyse

        paths = args.treatments or ["results.jsonl"]
        charts, docs = analyse(paths, args.charts_dir, args.docs_dir)
        for p in charts + docs:
            print(p)
        return

    names = args.treatments or list(REGISTRY)
    sizes = [int(s) for s in args.sizes.split(",")]
    rng = np.random.default_rng(args.seed)
    out = open(args.out, "a") if args.out else None
    try:
        for name in names:
            if name not in REGISTRY:
                print(f"unknown treatment {name}", file=sys.stderr)
                continue
            REGISTRY[name](out, sizes, rng)
    finally:
        if out:
            out.close()


if __name__ == "__main__":
    main()
