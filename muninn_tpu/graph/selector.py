"""Placeholder — implemented in the selector milestone."""


def select(*a, **k):  # pragma: no cover
    raise NotImplementedError
