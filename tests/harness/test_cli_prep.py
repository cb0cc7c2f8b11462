"""prep stage: cache materialization + cache-hit loading (reference
``benchmarks/harness/tests/test_prep*.py`` roles)."""

import json

import numpy as np
import pytest

from benchmarks.harness import prep as prep_mod
from benchmarks.harness.cli import main


@pytest.fixture
def data_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(prep_mod, "DATA_DIR", tmp_path)
    return tmp_path


def test_prep_writes_all_kinds(data_dir):
    written = prep_mod.prep([300, 600])
    names = {p.name for p in written}
    assert names == {
        "vss_n300_d128.npz", "vss_n600_d128.npz",
        "er_names_100.json", "er_names_200.json",
    }
    z = np.load(data_dir / "vss_n300_d128.npz")
    assert z["x"].shape == (300, 128)
    assert z["q_heldout"].shape == z["q_ood"].shape == (256, 128)
    names_300 = json.loads((data_dir / "er_names_100.json").read_text())
    assert len(names_300) == 300


def test_prep_is_idempotent(data_dir):
    first = prep_mod.prep([300])
    assert len(first) == 2
    assert prep_mod.prep([300]) == []  # nothing rewritten


def test_prep_kinds_filter(data_dir):
    written = prep_mod.prep([300], kinds=["er"])
    assert [p.suffix for p in written] == [".json"]
    assert not list(data_dir.glob("*.npz"))


def test_vss_data_prefers_cache(data_dir, rng):
    """After prep, vss_data must serve the cached corpus byte-for-byte
    (treatments across processes see identical data — the point of the
    reference's prep stage)."""
    prep_mod.prep([300], seed=5)
    x1, qh1, qo1 = prep_mod.vss_data(rng, 300, 128)
    x2, qh2, qo2 = prep_mod.vss_data(np.random.default_rng(999), 300, 128)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(qh1, qh2)
    np.testing.assert_array_equal(qo1, qo2)


def test_vss_data_cache_miss_generates(data_dir, rng):
    x, qh, qo = prep_mod.vss_data(rng, 250, 64, n_q=32)
    assert x.shape == (250, 64) and qh.shape == qo.shape == (32, 64)


def test_vss_data_rejects_stale_cache_shape(data_dir, rng):
    """A cache written for a different (n, dim) or too few queries must
    be regenerated, not mis-served."""
    p = prep_mod.vss_cache_path(300, 128)
    np.savez(p, x=np.zeros((10, 8), np.float32),
             q_heldout=np.zeros((4, 8), np.float32),
             q_ood=np.zeros((4, 8), np.float32))
    x, qh, _ = prep_mod.vss_data(rng, 300, 128)
    assert x.shape == (300, 128) and qh.shape[0] == 256


def test_er_names_rejects_wrong_count(data_dir):
    p = prep_mod.er_cache_path(50)
    p.write_text(json.dumps(["only", "three", "names"]))
    assert len(prep_mod.er_names(50)) == 150


def test_cli_prep_prints_paths(data_dir, capsys):
    main(["prep", "--sizes", "300"])
    out = capsys.readouterr().out
    assert "2 cache file(s) written" in out
    assert "vss_n300_d128.npz" in out
    main(["prep", "--sizes", "300"])
    assert "0 cache file(s) written" in capsys.readouterr().out


def test_cli_prep_kind_selection(data_dir, capsys):
    main(["prep", "er", "--sizes", "300"])
    out = capsys.readouterr().out
    assert "er_names_100.json" in out and ".npz" not in out
