"""Centrality + communities + bridge detection on a follow graph."""

from muninn_tpu import Graph

# two friend circles bridged by dana -> gil
CIRCLE_A = ["alice", "bob", "carol", "dana"]
CIRCLE_B = ["gil", "hana", "ivan", "june"]
FOLLOWS = (
    [(a, b) for a in CIRCLE_A for b in CIRCLE_A if a < b]
    + [(a, b) for a in CIRCLE_B for b in CIRCLE_B if a < b]
    + [("dana", "gil")]
)


def main() -> dict:
    g = Graph.from_edges(*zip(*FOLLOWS))

    pr = g.pagerank()
    top = sorted(pr, key=pr.get, reverse=True)[:3]
    print("pagerank top-3:", [(n, round(pr[n], 3)) for n in top])

    deg = g.degree(direction="both")
    print("degrees:", {n: int(d) for n, d in sorted(deg.items())})

    comps = g.connected_components()
    print("components:", {n: c for n, (c, _) in sorted(comps.items())})

    labels, q = g.leiden(seed=0)
    groups: dict = {}
    for n, c in labels.items():
        groups.setdefault(c, []).append(n)
    communities = sorted(sorted(m) for m in groups.values())
    print(f"leiden (Q={q:.3f}):", communities)
    split_ok = communities == [sorted(CIRCLE_A), sorted(CIRCLE_B)]
    print("recovered the two circles:", split_ok)

    bt = g.betweenness(normalized=True)
    bridge_nodes = sorted(bt, key=bt.get, reverse=True)[:2]
    print("betweenness peaks:", [(n, round(bt[n], 3)) for n in bridge_nodes])

    eb = g.edge_betweenness(normalized=True)
    bridge = max(eb, key=eb.get)
    print("highest-betweenness edge (the bridge):", bridge)

    cl = g.closeness(normalized=True)
    print("closeness of bridge endpoints:",
          {n: round(cl[n], 3) for n in ("dana", "gil")})
    return {
        "split_ok": split_ok,
        "bridge": bridge,
        "bridge_nodes": set(bridge_nodes),
    }


if __name__ == "__main__":
    main()
