"""prep stage: data caches are materialized once and reused."""

import numpy as np

from benchmarks.harness import prep as prep_mod


def test_prep_writes_and_reuses_caches(tmp_path, rng, monkeypatch):
    monkeypatch.setattr(prep_mod, "DATA_DIR", tmp_path)
    written = prep_mod.prep([400], seed=0)
    assert len(written) == 2  # vectors + er names
    # idempotent: second prep writes nothing
    assert prep_mod.prep([400], seed=0) == []

    x, qh, qo = prep_mod.vss_data(rng, 400, 128)
    assert x.shape == (400, 128)
    np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, rtol=1e-5)
    # cached data is byte-stable across loads
    x2, qh2, _ = prep_mod.vss_data(rng, 400, 128)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(qh, qh2)


def test_vss_data_generates_without_cache(tmp_path, rng, monkeypatch):
    monkeypatch.setattr(prep_mod, "DATA_DIR", tmp_path)
    x, qh, qo = prep_mod.vss_data(rng, 300, 64)
    assert x.shape == (300, 64) and qh.shape == qo.shape == (256, 64)


def test_heldout_queries_are_near_corpus(rng):
    """Held-out queries perturb corpus points (reference-comparable
    distribution); OOD queries come from fresh clusters."""
    from benchmarks.harness.core import _clustered, _heldout_queries

    x = _clustered(rng, 500, 64)
    qh = _heldout_queries(rng, x, 128)
    qo = _clustered(rng, 128, 64)
    sim_h = (qh @ x.T).max(axis=1)
    sim_o = (qo @ x.T).max(axis=1)
    assert sim_h.mean() > 0.9
    assert sim_h.mean() > sim_o.mean() + 0.05


def test_er_names_structure(tmp_path, monkeypatch):
    monkeypatch.setattr(prep_mod, "DATA_DIR", tmp_path)
    names = prep_mod.er_names(50)
    assert len(names) == 150
    assert names[50] == names[0].upper()
    assert "Hldgs" in names[100]
