"""Selector DSL differential fuzz: generate random selector ASTs,
render to text, run `select()` on a random DAG-ish graph, and compare
against a brute-force networkx-free oracle built from plain BFS sets.

Oracle semantics (docs/graph-select.md):
  node      -> {node}
  +node     -> node + ancestors (unlimited), N+node -> depth<=N
  node+     -> node + descendants, node+M -> depth<=M
  @node     -> descendants(node) + ancestors of ALL those descendants
  a,b       -> intersection; "not a" -> complement
  "a b"     -> union of terms
"""
import sys, time, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.graph.api import Graph
from muninn_tpu.graph.selector import select

rng = np.random.default_rng(13)


def bfs_set(adj, start, depth):
    out = {start}
    frontier = {start}
    d = 0
    while frontier and (depth is None or d < depth):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= out
        out |= nxt
        frontier = nxt
        d += 1
    return out


def atom_set(fwd, rev, names, a):
    ident, up, down, closure = a
    if closure:
        desc = bfs_set(fwd, ident, None)
        out = set(desc)
        for n in desc:
            out |= bfs_set(rev, n, None)
        return out
    out = {ident}
    if up is not None:
        out |= bfs_set(rev, ident, None if up < 0 else up)
    if down is not None:
        out |= bfs_set(fwd, ident, None if down < 0 else down)
    return out


def render_atom(a):
    ident, up, down, closure = a
    if closure:
        return "@" + ident
    s = ident
    if up is not None:
        s = ("+" if up < 0 else f"{up}+") + s
    if down is not None:
        s = s + ("+" if down < 0 else f"+{down}")
    return s


def rand_atom(names):
    ident = str(rng.choice(names))
    if rng.random() < 0.15:
        return (ident, None, None, True)
    up = down = None
    r = rng.random()
    if r < 0.35:
        up = int(rng.choice([-1, 1, 2, 3]))
    if r > 0.4 and r < 0.75:
        down = int(rng.choice([-1, 1, 2, 3]))
    if r >= 0.75:
        up = int(rng.choice([-1, 2]))
        down = int(rng.choice([-1, 1]))
    return (ident, up, down, False)


n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 30
fails = 0
t0 = time.time()
for trial in range(n_trials):
    v = int(rng.integers(6, 40))
    e = int(rng.integers(v, 4 * v))
    names = [f"m{i}" for i in range(v)]
    src = rng.integers(0, v, e)
    dst = rng.integers(0, v, e)
    g = Graph.from_edges([names[i] for i in src], [names[i] for i in dst])
    fwd, rev = {}, {}
    for a, b in zip(src, dst):
        fwd.setdefault(names[a], set()).add(names[b])
        rev.setdefault(names[b], set()).add(names[a])

    # only nodes that appear in an edge exist in the graph
    present = sorted({names[i] for i in src} | {names[i] for i in dst})
    # random expression: 1-3 terms, each 1-2 atoms; "not" takes ONE atom
    terms = []
    for _ in range(int(rng.integers(1, 4))):
        negated = rng.random() < 0.25
        n_atoms = 1 if negated else int(rng.integers(1, 3))
        atoms = [rand_atom(present) for _ in range(n_atoms)]
        terms.append((atoms, negated))
    text = " ".join(
        ("not " if neg else "") + ",".join(render_atom(a) for a in atoms)
        for atoms, neg in terms
    )
    tag = f"trial={trial} v={v} e={e} sel={text!r}"
    try:
        want = set()
        allnodes = set(present)
        for atoms, neg in terms:
            tset = allnodes.copy()
            for a in atoms:
                tset &= atom_set(fwd, rev, names, a)
            if neg:
                tset = allnodes - tset
            want |= tset
        got = {r[0] for r in select(g, text)}
        assert got == want, (
            f"mismatch: extra={sorted(got - want)[:8]} "
            f"missing={sorted(want - got)[:8]}")
        print(f"ok {tag} |got|={len(got)} ({time.time()-t0:.0f}s)", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()
print(f"done: {n_trials} trials, {fails} failures", flush=True)
