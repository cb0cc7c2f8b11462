"""Distance kernels vs numpy brute force (the reference tests vec_math
against scalar loops, test/test_vec_math.c)."""

import numpy as np
import jax.numpy as jnp
import pytest

from muninn_tpu.ops.distance import (
    Metric,
    gathered_distances,
    normalize_rows,
    pairwise_distances,
    parse_metric,
)


def np_dist(q, c, metric):
    if metric == "l2":
        return ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    dots = q @ c.T
    if metric == "inner_product":
        return -dots
    qn = np.linalg.norm(q, axis=1)[:, None]
    cn = np.linalg.norm(c, axis=1)[None, :]
    return 1.0 - dots / (qn * cn)


@pytest.mark.parametrize("metric", ["l2", "cosine", "inner_product"])
def test_pairwise_matches_numpy(rng, metric):
    q = rng.standard_normal((7, 33)).astype(np.float32)
    c = rng.standard_normal((19, 33)).astype(np.float32)
    got = np.asarray(pairwise_distances(jnp.array(q), jnp.array(c), Metric(metric)))
    want = np_dist(q, c, metric)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_l2_identical_is_zero(rng):
    x = rng.standard_normal((5, 16)).astype(np.float32)
    d = np.asarray(pairwise_distances(jnp.array(x), jnp.array(x), Metric.L2))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-4)
    assert (d >= 0).all()  # clamped, no negative squared distances


def test_cosine_zero_vector_guard():
    # reference returns 1.0 when a norm underflows (src/vec_math.c:163-164)
    q = jnp.zeros((1, 8))
    c = jnp.ones((1, 8))
    d = np.asarray(pairwise_distances(q, c, Metric.COSINE))
    np.testing.assert_allclose(d, 1.0, atol=1e-6)


@pytest.mark.parametrize("metric", ["l2", "cosine", "inner_product"])
def test_gathered_matches_pairwise(rng, metric):
    q = rng.standard_normal((4, 24)).astype(np.float32)
    c = rng.standard_normal((9, 24)).astype(np.float32)
    full = np.asarray(pairwise_distances(jnp.array(q), jnp.array(c), Metric(metric)))
    idx = rng.integers(0, 9, size=(4, 5))
    gathered = np.asarray(
        gathered_distances(jnp.array(q), jnp.array(c)[idx], Metric(metric))
    )
    want = np.take_along_axis(full, idx, axis=1)
    np.testing.assert_allclose(gathered, want, rtol=1e-4, atol=1e-4)


def test_parse_metric():
    assert parse_metric("l2") is Metric.L2
    assert parse_metric("cosine") is Metric.COSINE
    assert parse_metric("inner_product") is Metric.INNER_PRODUCT
    assert parse_metric(Metric.L2) is Metric.L2
    with pytest.raises(ValueError):
        parse_metric("euclidean")


def test_normalize_rows(rng):
    x = rng.standard_normal((6, 12)).astype(np.float32)
    n = np.asarray(normalize_rows(jnp.array(x)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-5)


def test_bfloat16_precision_close(rng):
    q = rng.standard_normal((4, 128)).astype(np.float32)
    c = rng.standard_normal((16, 128)).astype(np.float32)
    f32 = np.asarray(pairwise_distances(jnp.array(q), jnp.array(c), Metric.L2))
    bf16 = np.asarray(
        pairwise_distances(jnp.array(q), jnp.array(c), Metric.L2, precision="bfloat16")
    )
    np.testing.assert_allclose(bf16, f32, rtol=0.05, atol=0.5)
