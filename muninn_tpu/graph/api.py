"""Placeholder — implemented in the graph milestone."""


class Graph:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError("Graph lands in the graph milestone")
