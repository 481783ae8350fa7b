import jax
import jax.numpy as jnp
import numpy as np

from geometry_rl_tpu.utils.tensor import (
    batched_trace,
    batched_trace_square,
    fill_triangular,
    fill_triangular_inverse,
    generate_minibatches,
    inverse_softplus,
    one_hot,
    polyak_update,
    sqrtm_eig,
    sqrtm_newton,
    two_hot,
)


def _random_psd(rng, b, d):
    a = rng.normal(size=(b, d, d)).astype(np.float32)
    return a @ a.transpose(0, 2, 1) + 0.1 * np.eye(d, dtype=np.float32)


def test_batched_trace():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 5, 5)).astype(np.float32)
    np.testing.assert_allclose(batched_trace(jnp.asarray(x)), np.trace(x, axis1=1, axis2=2), rtol=1e-5)
    np.testing.assert_allclose(
        batched_trace_square(jnp.asarray(x)), np.einsum("bij,bij->b", x, x), rtol=1e-4
    )


def test_sqrtm_variants():
    rng = np.random.default_rng(1)
    m = _random_psd(rng, 3, 4)
    for fn in (sqrtm_newton, sqrtm_eig):
        s = np.asarray(fn(jnp.asarray(m)))
        np.testing.assert_allclose(s @ s, m, rtol=1e-2, atol=1e-3)


def test_fill_triangular_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(7, 10)).astype(np.float32)  # d=4
    mat = fill_triangular(jnp.asarray(x))
    assert mat.shape == (7, 4, 4)
    # upper part zero
    assert float(jnp.abs(jnp.triu(mat, k=1)).max()) == 0.0
    back = fill_triangular_inverse(mat)
    np.testing.assert_allclose(back, x, rtol=1e-6)


def test_inverse_softplus():
    x = jnp.asarray([0.1, 1.0, 5.0, 30.0])
    y = inverse_softplus(x)
    np.testing.assert_allclose(jnp.logaddexp(y, 0.0), x, rtol=1e-5)  # softplus(y) == x


def test_polyak():
    t = {"w": jnp.zeros(3)}
    o = {"w": jnp.ones(3)}
    out = polyak_update(t, o, 0.25)
    np.testing.assert_allclose(out["w"], 0.25)


def test_one_and_two_hot():
    oh = one_hot(jnp.asarray([0, 2]), 3)
    np.testing.assert_allclose(oh, [[1, 0, 0], [0, 0, 1]])
    bins = jnp.linspace(0.0, 1.0, 5)
    th = two_hot(jnp.asarray([0.375]), bins)
    np.testing.assert_allclose(np.asarray(th[0]), [0, 0.5, 0.5, 0, 0], atol=1e-6)
    # mass sums to 1 and encodes the value
    np.testing.assert_allclose(float((th[0] * bins).sum()), 0.375, atol=1e-6)


def test_generate_minibatches():
    batches = list(generate_minibatches(jax.random.PRNGKey(0), 10, 3))
    assert len(batches) == 3
    flat = np.concatenate([np.asarray(b) for b in batches])
    assert len(set(flat.tolist())) == 9  # distinct indices
