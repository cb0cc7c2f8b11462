"""Registry: permutation enumeration, ids, filtering, status."""

from benchmarks.harness import REGISTRY
from benchmarks.harness.registry import (
    all_permutations,
    filter_permutations,
    permutation_status,
)


def test_registry_has_all_treatment_families():
    assert {
        "vss", "graph_traversal", "graph_centrality", "graph_community",
        "graph_vt", "node2vec", "embed", "kg_extract", "kg_re",
        "kg_resolve", "kg_graphrag",
    } <= set(REGISTRY)


def test_all_permutations_cover_grid():
    perms = all_permutations([500, 1000])
    by_treatment = {}
    for p in perms:
        by_treatment.setdefault(p.treatment, []).append(p)
    # vss: 4 engines heldout + 1 hnsw ood per size, plus the fixed
    # reference model-dim series (6 x 384-d, 3 x 1024-d)
    assert len(by_treatment["vss"]) == 14 + 9  # 4 engines + ood + 2 zipf per size
    assert len(by_treatment["graph_traversal"]) == 2
    # singletons appear once regardless of sizes
    assert len(by_treatment["embed"]) == 3  # hash + 2 flax shapes


def test_permutation_ids_unique_and_stable():
    perms = all_permutations([1000, 5000])
    ids = [p.perm_id for p in perms]
    assert len(ids) == len(set(ids))
    # stable across calls (canonical JSON params)
    assert ids == [p.perm_id for p in all_permutations([1000, 5000])]
    assert any("vss" in i and "n1000" in i for i in ids)


def test_filter_permutations():
    vss = filter_permutations([1000], treatment="vss")
    assert vss and all(p.treatment == "vss" for p in vss)
    one = filter_permutations([1000], perm_id=vss[0].perm_id)
    assert len(one) == 1 and one[0] == vss[0]
    assert filter_permutations([1000], perm_id="nope") == []


def test_permutation_status_missing_by_default(tmp_path):
    rows = permutation_status([500], results_dir=tmp_path)
    assert rows and all(not done for _, done in rows)


def test_graph_scale_grid_is_device_regime_only():
    """graph_scale only emits permutations at device-regime sizes: tiny
    sizes would measure tunnel dispatch, not the engine, and the CLI's
    default --sizes would otherwise pollute every full `run`."""
    grid = REGISTRY["graph_scale"].grid
    assert grid([1000, 5000]) == []
    assert grid([5000, 1_000_000]) == [{"n": 1_000_000, "avg_deg": 10}]
