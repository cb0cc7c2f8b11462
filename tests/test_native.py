"""Native host runtime: interning, CSR build/delta, Jaro-Winkler —
native vs pure-python fallbacks (the reference's test_string_sim.c /
test_graph_csr.c / test_graph_load.c roles)."""

import numpy as np
import pytest

from muninn_tpu import native


def test_native_builds():
    assert native._load() is not None, "g++ build of libmuninn_host.so failed"
    assert native.HAVE_NATIVE


def test_intern_table_roundtrip():
    t = native.InternTable()
    ids = t.add(["apple", "banana", "apple", "cherry"])
    np.testing.assert_array_equal(ids, [0, 1, 0, 2])
    assert len(t) == 3
    found = t.find(["banana", "durian", "apple"])
    np.testing.assert_array_equal(found, [1, -1, 0])


def test_intern_unicode():
    t = native.InternTable()
    ids = t.add(["héllo", "wörld", "héllo"])
    np.testing.assert_array_equal(ids, [0, 1, 0])


def test_csr_build_matches_numpy(rng):
    e, v = 5000, 300
    src = rng.integers(0, v, e).astype(np.int32)
    dst = rng.integers(0, v, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    off, s, d, ww = native.csr_build(src, dst, w, v)
    assert off[-1] == e
    # offsets consistent with counts
    np.testing.assert_array_equal(
        np.diff(off), np.bincount(src, minlength=v)
    )
    # every row segment contains exactly the right edges
    assert (s == np.sort(src, kind="stable")).all()
    for node in rng.integers(0, v, 10):
        seg = slice(off[node], off[node + 1])
        want_dst = dst[src == node]
        np.testing.assert_array_equal(np.sort(d[seg]), np.sort(want_dst))


def test_csr_apply_delta():
    src = np.array([0, 1, 2, 1], np.int32)
    dst = np.array([1, 2, 0, 2], np.int32)
    w = np.ones(4, np.float32)
    # delete ONE (1,2) pair (the other parallel duplicate survives,
    # graph_csr.c:219-247 removes a single match), insert (3,0)
    d_src = np.array([1, 3], np.int32)
    d_dst = np.array([2, 0], np.int32)
    d_w = np.array([0, 2.5], np.float32)
    d_op = np.array([1, 0], np.uint8)
    s, d, ww = native.csr_apply_delta(src, dst, w, d_src, d_dst, d_w, d_op)
    pairs = sorted(zip(s.tolist(), d.tolist()))
    assert pairs == [(0, 1), (1, 2), (2, 0), (3, 0)]
    assert ww[list(zip(s, d)).index((3, 0))] == 2.5


def test_csr_apply_delta_in_order_replay():
    """Deltas replay in order: delete-then-insert of the same edge in
    one batch keeps the edge; insert-then-delete cancels out; a delete
    of a never-present edge is a no-op."""
    src = np.array([0], np.int32)
    dst = np.array([1], np.int32)
    w = np.array([1.0], np.float32)
    d_src = np.array([0, 0, 5, 5, 9], np.int32)
    d_dst = np.array([1, 1, 6, 6, 9], np.int32)
    d_w = np.array([0.0, 7.0, 3.0, 0.0, 0.0], np.float32)
    # delete (0,1); re-insert (0,1) w=7; insert (5,6); delete (5,6);
    # delete (9,9) never present
    d_op = np.array([1, 0, 0, 1, 1], np.uint8)
    s, d, ww = native.csr_apply_delta(src, dst, w, d_src, d_dst, d_w, d_op)
    assert list(zip(s.tolist(), d.tolist())) == [(0, 1)]
    assert ww[0] == 7.0


def test_csr_apply_delta_fallback_matches_native(rng, monkeypatch):
    if not native.HAVE_NATIVE and native._load() is None:
        pytest.skip("no native lib")
    e, nd, v = 200, 120, 12
    src = rng.integers(0, v, e).astype(np.int32)
    dst = rng.integers(0, v, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    d_src = rng.integers(0, v, nd).astype(np.int32)
    d_dst = rng.integers(0, v, nd).astype(np.int32)
    d_w = rng.random(nd).astype(np.float32)
    d_op = rng.integers(0, 2, nd).astype(np.uint8)
    ns, ndd, nw = native.csr_apply_delta(src, dst, w, d_src, d_dst, d_w, d_op)

    def no_lib():
        return None

    monkeypatch.setattr(native, "_load", no_lib)
    ps, pd, pw = native.csr_apply_delta(src, dst, w, d_src, d_dst, d_w, d_op)
    # multiset equality is not enough: in-order single-match semantics
    # make the surviving-edge order deterministic too
    np.testing.assert_array_equal(ns, ps)
    np.testing.assert_array_equal(ndd, pd)
    np.testing.assert_allclose(nw, pw)


@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("martha", "marhta", 0.9611),
        ("dixon", "dicksonx", 0.8133),
        ("jellyfish", "smellyfish", 0.8962),
        ("", "", 1.0),
        ("abc", "", 0.0),
        ("same", "same", 1.0),
    ],
)
def test_jaro_winkler_known_values(a, b, expected):
    # canonical JW test vectors
    assert native.jaro_winkler(a, b) == pytest.approx(expected, abs=1e-3)


def test_jaro_winkler_native_matches_python():
    cases = [
        ("alice smith", "alice smyth"),
        ("bob", "robert"),
        ("acme corp", "acme corporation"),
        ("x", "y"),
    ]
    for a, b in cases:
        assert native.jaro_winkler(a, b) == pytest.approx(
            native._jw_py(a, b), abs=1e-9
        )


def test_jaro_winkler_batch():
    a = ["martha", "dixon"]
    b = ["marhta", "dicksonx"]
    out = native.jaro_winkler_batch(a, b)
    assert out[0] == pytest.approx(0.9611, abs=1e-3)
    assert out[1] == pytest.approx(0.8133, abs=1e-3)


def test_jaro_winkler_unicode_consistent_across_backends():
    """Non-ASCII strings must score identically with and without the
    native lib (the C++ kernel scans UTF-8 bytes; code points are the
    contract) — environment-dependent JW flipped ER merges around the
    cascade threshold."""
    from muninn_tpu.native import _jw_py, jaro_winkler, jaro_winkler_batch

    pairs = [("Café Corp", "Cafe Corp"), ("Ångström", "Angstrom"),
             ("naïve", "naive"), ("plain", "plane")]
    for a, b in pairs:
        assert jaro_winkler(a, b) == pytest.approx(_jw_py(a, b), abs=1e-12)
    got = jaro_winkler_batch([a for a, _ in pairs], [b for _, b in pairs])
    want = [_jw_py(a, b) for a, b in pairs]
    np.testing.assert_allclose(got, want, atol=1e-12)
