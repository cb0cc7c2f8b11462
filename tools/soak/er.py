"""ER cascade property fuzz: synthetic corpora with planted duplicate
groups (name variants sharing a char-ngram embedding) -> resolve ->
B-Cubed F1 vs gold must clear a floor; guards must hold exactly
(same_source: no intra-source merges; diff_type: no cross-type merges);
output must be a total partition over the input ids."""
import sys, time, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.er.resolve import Entity, resolve_entities
from muninn_tpu.er.metrics import bcubed_f1
from muninn_tpu.index.flat import FlatIndex


def ngram_embed(names, dim=64, seed=0):
    out = np.zeros((len(names), dim), np.float32)
    for i, nm in enumerate(names):
        s = f"^{nm.lower()}$"
        for j in range(len(s) - 2):
            out[i, hash(s[j:j + 3]) % dim] += 1.0
    out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)
    return out


FIRST = ["Alexander", "Katherine", "Jonathan", "Elizabeth", "Christopher",
         "Margarete", "Sebastian", "Valentina", "Maximilian", "Genevieve",
         "Bartholomew", "Anastasia", "Montgomery", "Penelope", "Theodore"]
LAST = ["Hamilton", "Vandermeer", "Okonkwo", "Castellano", "Lindqvist",
        "Abernathy", "Fitzgerald", "Nakamura", "Oyelaran", "Kowalczyk"]


def variants(name, rng, n):
    outs = {name}
    first, last = name.split(" ")
    cands = [
        f"{first[0]}. {last}",
        f"{first} {last}".upper(),
        f"{first.lower()} {last.lower()}",
        f"{first} {last[:-1]}",          # typo: dropped last char
        f"{first}  {last}",
    ]
    while len(outs) < n and cands:
        outs.add(cands.pop(0))
    return list(outs)[:n]


n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10
rng = np.random.default_rng(31)
fails = 0
t0 = time.time()
for trial in range(n_trials):
    guard = [None, "same_source", "diff_type"][trial % 3]
    n_groups = int(rng.integers(5, 11))
    ents, gold = [], {}
    eid = 0
    # distinct first AND last names across groups: name similarity can
    # separate them in principle (shared first names are the LLM
    # adjudicator's job, not the string cascade's)
    fsel = rng.choice(len(FIRST), size=n_groups, replace=False)
    lsel = rng.choice(len(LAST), size=n_groups, replace=False)
    for gi in range(n_groups):
        base = f"{FIRST[fsel[gi]]} {LAST[lsel[gi]]}"
        for v in variants(base, rng, int(rng.integers(1, 4))):
            ents.append(Entity(
                id=str(eid), name=v,
                source="s0" if guard == "same_source" else f"s{eid % 3}",
                type=(["PERSON", "ORG"][eid % 2]) if guard == "diff_type"
                else "PERSON",
            ))
            gold[str(eid)] = gi
            eid += 1
    emb = ngram_embed([e.name for e in ents])
    cap = int(2 ** np.ceil(np.log2(len(ents) + 1)))
    idx = FlatIndex(emb.shape[1], "cosine", use_pallas=False, capacity=cap)
    idx.insert(np.arange(len(ents)), emb)
    tag = f"trial={trial} n={len(ents)} groups={n_groups} guard={guard}"
    try:
        out = resolve_entities(ents, idx, k=8, dist_threshold=0.35,
                               jw_weight=0.6, type_guard=guard, seed=trial)
        clusters = out["clusters"]
        assert set(clusters) == {e.id for e in ents}, "not a total partition"
        by_cluster = {}
        for i, c in clusters.items():
            by_cluster.setdefault(c, []).append(i)
        if guard == "same_source":
            # every entity shares source s0 -> no edges at all -> all
            # singleton clusters
            assert all(len(m) == 1 for m in by_cluster.values()), (
                "same-source merge escaped the guard",
                [m for m in by_cluster.values() if len(m) > 1][:3])
        if guard == "diff_type":
            # groups are unique-name pairs; types alternate by eid so a
            # merged cluster can only form from same-type entities
            for members in by_cluster.values():
                types = {ents[int(i)].type for i in members}
                assert len(types) == 1, ("cross-type merge", members)
        if guard is None:
            f1 = bcubed_f1(clusters, gold)["f1"]
            assert f1 >= 0.75, f"bcubed f1 {f1:.3f}"
            print(f"ok {tag} f1={f1:.3f} ({time.time()-t0:.0f}s)", flush=True)
        else:
            print(f"ok {tag} guard-held ({time.time()-t0:.0f}s)", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()
print(f"done: {n_trials} trials, {fails} failures", flush=True)
