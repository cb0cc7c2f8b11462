"""Entity resolution cascade.

Re-design of the reference's ``muninn_extract_er``
(``src/llama_er.c``), the one pipeline composing all three subsystems
(ANN + string similarity + graph clustering):

1. **KNN blocking**: batched vector search over the entity index — one
   call for all entities (the reference loops per-entity SQL MATCH
   queries, ``:207-287``).
2. **Scoring cascade** (``:289-332``): exact match 1.0,
   case-insensitive 0.9, else ``jw_weight * JaroWinkler +
   (1 - jw_weight) * cosine_sim`` against
   ``match_threshold = 1 - dist_threshold + borderline_delta``.
   Guards: ``same_source`` forbids intra-source matches, ``diff_type``
   forbids cross-type matches.
3. **Leiden clustering** over the match graph (``:334-440``).
4. Optional **edge-betweenness bridge cutting**: edges above
   ``eb_threshold`` (normalized) are cut and Leiden re-runs
   (``:442-545``).

Returns ``{"clusters": {entity_id: cluster_id}}`` like the reference's
JSON output (``:547-574``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from muninn_tpu.graph.api import Graph
from muninn_tpu.native import jaro_winkler_batch


@dataclass
class Entity:
    id: str
    name: str
    source: str | None = None
    type: str | None = None


def resolve_entities(
    entities: list[Entity] | list[dict],
    index,
    *,
    k: int = 10,
    dist_threshold: float = 0.4,
    jw_weight: float = 0.6,
    borderline_delta: float = 0.0,
    chat_model: str | None = None,
    eb_threshold: float | None = None,
    type_guard: str | None = None,       # 'same_source' | 'diff_type' | None
    resolution: float = 1.0,
    seed: int = 0,
    adjudicate_context=None,             # Callable[[Entity, Entity], str] | None
    adjudicate_min_confidence: float | None = None,
) -> dict:
    """``muninn_extract_er(hnsw_table, name_col, k, dist_threshold,
    jw_weight, borderline_delta[, chat_model[, eb_threshold[,
    type_guard]]])`` equivalent.

    ``index`` is a FlatIndex/HnswIndex whose rows are keyed by the
    positional entity index (0..n-1) or by int(entity.id); it must hold
    one vector per entity.

    ``chat_model``: name of a registered chat model. When set,
    borderline pairs — blended score within ``borderline_delta`` of the
    base threshold ``1 - dist_threshold`` — are adjudicated by ONE
    batched grammar-constrained yes/no decode instead of being
    uniformly rejected. (The reference declares this adjudication as
    TODO, ``src/llama_er.c:291-293``; here it's implemented.) Without
    ``chat_model`` the reference's strict rule applies: match iff
    ``score >= 1 - dist_threshold + borderline_delta``.

    Adjudication knobs (only used with ``chat_model``):

    - ``adjudicate_context``: ``fn(entity_a, entity_b) -> str`` whose
      return is appended to each pair's prompt (attributes, source
      snippets, ...). By default the entities' ``source``/``type``
      fields are included when present.
    - ``adjudicate_min_confidence``: switch the decode from yes/no to
      a 0-10 confidence grammar; a pair matches when
      ``confidence/10 >= adjudicate_min_confidence``. The blended
      cascade score is unaffected — only borderline pairs decode.
    """
    ents = [
        e if isinstance(e, Entity) else Entity(**e) for e in entities
    ]
    n = len(ents)
    if n == 0:
        return {"clusters": {}}

    # 1. KNN blocking — one batched vector fetch + one batched search
    # (the reference loops per-entity SQL queries; per-row device
    # fetches would round-trip per entity)
    import jax.numpy as jnp

    row_ids = [_row_id(e, i) for i, e in enumerate(ents)]
    slots = index.store.slots_of(row_ids)
    vecs = np.asarray(index.store.vectors[jnp.asarray(slots)])
    ids, dists = index.search(vecs, k=k + 1)

    # candidate-pair assembly, fully vectorized (the round-2 dict loop
    # over n*k results capped the cascade at ~50 entities/s; array ops
    # make it linear in pairs with tiny constants):
    # result external ids -> entity rows by sorted binary search
    ids = np.asarray(ids, np.int64)
    dists = np.asarray(dists, np.float64)
    rid = np.asarray(row_ids, np.int64)
    rorder = np.argsort(rid, kind="stable").astype(np.int64)
    srid = rid[rorder]
    flat = ids.reshape(-1)
    pos = np.clip(np.searchsorted(srid, flat), 0, n - 1)
    valid = (flat >= 0) & (srid[pos] == flat)
    j = np.where(valid, rorder[pos], -1)
    i = np.repeat(np.arange(n, dtype=np.int64), ids.shape[1])
    valid &= j != i
    cos = _similarity(dists.reshape(-1), index)
    a = np.minimum(i, j)[valid]
    b = np.maximum(i, j)[valid]
    cos = cos[valid]
    if len(a) == 0:
        return {"clusters": {e.id: ci for ci, e in enumerate(ents)}}
    # dedup (a, b), keeping the max similarity
    uk, inv = np.unique(a * n + b, return_inverse=True)
    best = np.full(len(uk), -np.inf)
    np.maximum.at(best, inv, cos)
    pa = (uk // n).astype(np.int64)
    pb = (uk % n).astype(np.int64)

    # 2. guards + scoring cascade (all-array form of llama_er.c:289-332)
    # Both guards compare the `source` field (the reference's entities
    # carry one field doubling as source/entity-type, llama_er.c:299-309);
    # entities that populate only `type` fall back to it.
    g_code = np.empty(n, np.int64)
    _guard_codes: dict = {}
    for idx, e in enumerate(ents):
        v = e.source if e.source is not None else e.type
        g_code[idx] = (
            -1 if v is None else _guard_codes.setdefault(v, len(_guard_codes))
        )
    ga, gb = g_code[pa], g_code[pb]
    if type_guard == "same_source":
        keep = ~((ga >= 0) & (ga == gb))
    elif type_guard == "diff_type":
        keep = ~((ga >= 0) & (gb >= 0) & (ga != gb))
    else:
        keep = np.ones(len(pa), bool)
    pa, pb, best = pa[keep], pb[keep], best[keep]
    if len(pa) == 0:
        return {"clusters": {e.id: ci for ci, e in enumerate(ents)}}

    names = np.array([e.name for e in ents], object)
    lowers = np.array([e.name.lower() for e in ents], object)
    _, name_code = np.unique(names, return_inverse=True)
    _, lower_code = np.unique(lowers, return_inverse=True)
    # JW scores lowercased names (reference llama_er.c:320 compares
    # name_lower vs name_lower), so mixed-case variants score the same
    jw = jaro_winkler_batch(lowers[pa].tolist(), lowers[pb].tolist())
    exact = name_code[pa] == name_code[pb]
    ci_eq = (lower_code[pa] == lower_code[pb]) & ~exact
    score = np.where(
        exact, 1.0,
        np.where(ci_eq, 0.9, jw_weight * jw + (1.0 - jw_weight) * best),
    )

    match_threshold = 1.0 - dist_threshold + borderline_delta
    base_threshold = 1.0 - dist_threshold
    matched = score >= match_threshold
    edges_src = pa[matched]
    edges_dst = pb[matched]
    edges_w = score[matched]

    # LLM adjudication of borderline pairs: one batched yes/no decode
    # under a two-token grammar (src/llama_er.c:291-293's declared TODO)
    if chat_model is not None:
        bl = ~matched & (score >= base_threshold - borderline_delta)
        if bl.any():
            borderline = list(zip(pa[bl], pb[bl], score[bl]))
            verdicts = np.array(
                _adjudicate(
                    chat_model, borderline, ents,
                    context_fn=adjudicate_context,
                    min_confidence=adjudicate_min_confidence,
                ),
                bool,
            )
            edges_src = np.concatenate([edges_src, pa[bl][verdicts]])
            edges_dst = np.concatenate([edges_dst, pb[bl][verdicts]])
            edges_w = np.concatenate(
                [edges_w, np.maximum(score[bl][verdicts], base_threshold)]
            )

    if len(edges_src) == 0:
        return {"clusters": {e.id: ci for ci, e in enumerate(ents)}}

    # 3. Leiden over the match graph
    g = Graph.from_edges(edges_src, edges_dst, np.asarray(edges_w, np.float32))
    labels, _ = g.leiden(resolution=resolution, seed=seed)

    # 4. optional bridge cutting + re-cluster
    if eb_threshold is not None:
        eb = g.edge_betweenness(direction="both", normalized=True, weighted=False)
        keep = [
            (s, d, w) for s, d, w in zip(edges_src, edges_dst, edges_w)
            if eb.get((min(s, d), max(s, d)), 0.0) <= eb_threshold
        ]
        if keep and len(keep) < len(edges_src):
            s2, d2, w2 = zip(*keep)
            g = Graph.from_edges(list(s2), list(d2), np.asarray(w2, np.float32))
            labels, _ = g.leiden(resolution=resolution, seed=seed)

    # singletons (no surviving edges) get their own clusters
    next_cluster = (max(labels.values()) + 1) if labels else 0
    clusters: dict = {}
    for i, e in enumerate(ents):
        if i in labels:
            clusters[e.id] = int(labels[i])
        else:
            clusters[e.id] = next_cluster
            next_cluster += 1
    return {"clusters": clusters}


def _default_pair_context(a, b) -> str:
    """Source/type hints for the adjudication prompt, when present."""
    parts = []
    for tag, e in (("A", a), ("B", b)):
        bits = []
        if e.source is not None:
            bits.append(f"source={e.source!r}")
        if e.type is not None:
            bits.append(f"type={e.type!r}")
        if bits:
            parts.append(f"{tag}: " + ", ".join(bits))
    return ("Context — " + "; ".join(parts) + ".") if parts else ""


def _adjudicate(
    model_name: str,
    pairs: list[tuple[int, int, float]],
    ents,
    context_fn=None,
    min_confidence: float | None = None,
) -> list[bool]:
    """One batched grammar-constrained decode over all borderline
    pairs: yes/no by default, a 0-10 confidence rating when
    ``min_confidence`` is set."""
    from muninn_tpu.models.registry import ModelType, registry
    from muninn_tpu.text.grammar import GRAMMAR_CONFIDENCE, GRAMMAR_YES_NO

    model = registry.find_type(model_name, ModelType.CHAT)
    ctx = context_fn if context_fn is not None else _default_pair_context
    prompts = []
    for a, b, _ in pairs:
        p = f"Name A: {ents[a].name!r}. Name B: {ents[b].name!r}."
        extra = ctx(ents[a], ents[b])
        if extra:
            p = f"{p} {extra}"
        prompts.append(p)
    if min_confidence is None:
        outs = model.generate_batch(
            prompts,
            system_prompt=(
                "Do the two names refer to the same real-world entity? "
                "Answer strictly yes or no."
            ),
            grammar=GRAMMAR_YES_NO,
            max_tokens=4,
        )
        return [o.strip().lower().startswith("yes") for o in outs]
    outs = model.generate_batch(
        prompts,
        system_prompt=(
            "Rate your confidence that the two names refer to the same "
            "real-world entity, from 0 (certainly different) to 10 "
            "(certainly the same). Answer with the number only."
        ),
        grammar=GRAMMAR_CONFIDENCE,
        max_tokens=4,
    )
    verdicts = []
    for o in outs:
        try:
            conf = int(o.strip()) / 10.0
        except ValueError:
            conf = 0.0
        verdicts.append(conf >= min_confidence)
    return verdicts


def _similarity(dist: float, index) -> float:
    """Index distance -> cosine-similarity-like score in the blended
    cascade. The reference pipeline is cosine-only (``cosine_sim = 1 -
    cosine_dist``, llama_er.c:311); for L2 / inner-product indexes the
    conversion assumes unit-normalized vectors (squared L2 on unit
    vectors = 2(1-cos); -dot on unit vectors = -cos), instead of
    silently treating the raw distance as a cosine distance."""
    from muninn_tpu.ops.distance import Metric

    metric = getattr(index, "metric", Metric.COSINE)
    if metric is Metric.COSINE:
        return 1.0 - dist
    if metric is Metric.L2:
        return 1.0 - dist / 2.0
    if metric is Metric.INNER_PRODUCT:
        return -dist
    raise ValueError(f"unsupported index metric for ER: {metric}")


def _row_id(e: Entity, i: int) -> int:
    try:
        return int(e.id)
    except (TypeError, ValueError):
        return i
