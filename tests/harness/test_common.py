"""Shared harness plumbing: data generators + Record/emit_for
(reference ``benchmarks/harness/tests/test_common.py`` role)."""

import json

import numpy as np

from benchmarks.harness.core import (
    Record,
    _clustered,
    _er_graph,
    _er_names,
    _heldout_queries,
    emit_for,
)


def test_clustered_unit_norm_and_shape(rng):
    x = _clustered(rng, 500, 64)
    assert x.shape == (500, 64) and x.dtype == np.float32
    assert np.allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-5)


def test_clustered_is_actually_clustered(rng):
    """Corpus model: nearest-neighbor similarity must be far above the
    random-unit-vector expectation (~0 at dim 64)."""
    x = _clustered(rng, 400, 64)
    sims = x @ x.T
    np.fill_diagonal(sims, -1)
    assert float(np.median(sims.max(axis=1))) > 0.5


def test_heldout_queries_stay_in_distribution(rng):
    x = _clustered(rng, 400, 64)
    q = _heldout_queries(rng, x, 64)
    assert q.shape == (64, 64)
    assert np.allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)
    # each query is a perturbed corpus point: its best corpus match is
    # near-duplicate close (~0.93 at 0.05 noise in 64-d), unlike an OOD
    # query from fresh cluster centers (~0.2)
    assert float(np.median((q @ x.T).max(axis=1))) > 0.9
    ood = _clustered(rng, 64, 64)
    assert float(np.median((ood @ x.T).max(axis=1))) < 0.6


def test_er_names_structure_and_determinism():
    names = _er_names(10)
    assert len(names) == 30
    base, upper, abbrev = names[:10], names[10:20], names[20:]
    assert [b.upper() for b in base] == upper
    assert all(a.endswith(" Hldgs") for a in abbrev)
    assert all(b.endswith(" Holdings") for b in base)
    assert names == _er_names(10)  # seeded per-name: reproducible
    assert len(set(base)) == 10   # distinct base entities


def test_er_graph_shape(rng):
    src, dst = _er_graph(rng, 100, 7)
    assert len(src) == len(dst) == 700
    assert src.min() >= 0 and src.max() < 100
    assert dst.min() >= 0 and dst.max() < 100


def test_emit_for_prints_appends_and_collects(tmp_path, capsys):
    out_path = tmp_path / "r.jsonl"
    collected: list[Record] = []
    with open(out_path, "w") as out:
        emit = emit_for("demo", out, collected)
        emit({"n": 5}, {"qps": 123.0}, 0.25)
        emit({"n": 6}, {"qps": 99.0}, 0.5)
    printed = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    on_disk = [json.loads(l) for l in out_path.read_text().splitlines()]
    assert printed == on_disk and len(on_disk) == 2
    rec = on_disk[0]
    assert rec["treatment"] == "demo"
    assert rec["permutation"] == {"n": 5}
    assert rec["metrics"] == {"qps": 123.0}
    assert rec["wall_s"] == 0.25
    assert rec["peak_rss_mb"] > 0 and rec["ts"] > 0
    assert "-" in rec["platform"]  # system-machine, lowercased
    assert rec["platform"] == rec["platform"].lower()
    # honest backend stamp: conftest forces the cpu backend, and jax is
    # live by the time tests run — rows must say which backend ran them
    assert rec["backend"] == "cpu"
    assert [r.permutation for r in collected] == [{"n": 5}, {"n": 6}]


def test_backend_stamp_never_initializes_jax():
    """Stamping a record must not trigger backend init (a dead-tunnel
    init hangs host-only treatments): with jax absent from sys.modules
    the stamp is 'none'."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '.');"
         "from benchmarks.harness.core import _jax_backend;"
         "print(_jax_backend());"
         "from jax._src import xla_bridge;"
         "assert not xla_bridge._backends, 'stamp initialized a backend'"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "none"


def test_emit_for_without_sinks(capsys):
    """out=None / collect=None still prints the JSONL line."""
    emit = emit_for("demo", None, None)
    emit({}, {"v": 1}, 0.0)
    assert json.loads(capsys.readouterr().out)["metrics"] == {"v": 1}
