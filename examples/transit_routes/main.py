"""Weighted shortest paths + centrality + temporal filters on a metro map."""

from muninn_tpu import Graph

# (from, to, minutes, line opened in year)
SEGMENTS = [
    ("airport", "central", 18.0, 1990),
    ("central", "museum", 4.0, 1990),
    ("museum", "harbor", 5.0, 1990),
    ("central", "university", 6.0, 2002),
    ("university", "harbor", 7.0, 2002),
    ("airport", "harbor", 35.0, 1990),      # slow direct shuttle
    ("central", "stadium", 9.0, 2020),      # new line
    ("stadium", "harbor", 3.0, 2020),
]


def main() -> dict:
    src, dst, minutes, opened = zip(*SEGMENTS)
    # undirected service: add both directions
    g = Graph.from_edges(src + dst, dst + src, minutes + minutes)

    stops_path, n_hops = g.shortest_path("airport", "harbor", weighted=False)
    fast_path, total_min = g.shortest_path("airport", "harbor", weighted=True)
    print(f"fewest stops : {' -> '.join(stops_path)} ({int(n_hops)} hops)")
    print(f"fastest      : {' -> '.join(fast_path)} ({total_min:.0f} min)")

    reach = [n for n, d, _ in g.bfs("airport", max_depth=2)]
    print("within 2 hops of airport:", sorted(reach))

    cl = g.closeness(normalized=True, weighted=True)
    hub = max(cl, key=cl.get)
    print("most central station (weighted closeness):", hub)

    # route on the 2015 network: stadium line didn't exist yet
    g2015 = Graph.from_edges(
        src + dst, dst + src, minutes + minutes,
        timestamps=opened + opened, time_end=2015,
    )
    old_path, old_min = g2015.shortest_path("airport", "harbor", weighted=True)
    print(f"fastest in 2015: {' -> '.join(old_path)} ({old_min:.0f} min)")
    return {
        "fast_path": fast_path, "total_min": total_min,
        "hub": hub, "old_path": old_path,
    }


if __name__ == "__main__":
    main()
