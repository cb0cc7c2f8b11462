"""Placeholder — implemented in the node2vec milestone."""


def node2vec_train(*a, **k):  # pragma: no cover
    raise NotImplementedError
