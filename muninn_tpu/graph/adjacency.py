"""Placeholder — implemented in the graph milestone."""


class GraphCache:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError
