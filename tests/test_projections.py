"""Golden-value tests of the Gaussian toolkit and trust-region projections.

References are independent numpy implementations of the closed forms in
`geometry_rl/algorithms/trust_region_projections/utils/projection_utils.py`
and a scipy-free numeric solve of the ITPAL diag-cov KL projection problem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu.rl import gaussian as G
from geometry_rl_tpu.rl.projections import (
    BaseProjection,
    FrobeniusProjection,
    KLProjection,
    WassersteinProjection,
    entropy_inequality_projection,
    get_projection_layer,
    kl_diag_cov_projection,
    mean_projection,
)

B, K = 16, 6


@pytest.fixture
def dists():
    rng = np.random.default_rng(42)
    mean = rng.normal(size=(B, K)).astype(np.float32)
    std = np.exp(rng.normal(scale=0.3, size=(B, K))).astype(np.float32)
    old_mean = mean + 0.1 * rng.normal(size=(B, K)).astype(np.float32)
    old_std = np.exp(rng.normal(scale=0.3, size=(B, K))).astype(np.float32)
    p = G.DiagGaussian(jnp.asarray(mean), jnp.asarray(std))
    q = G.DiagGaussian(jnp.asarray(old_mean), jnp.asarray(old_std))
    return p, q


def np_kl_parts(mean, std, mean_o, std_o):
    k = mean.shape[-1]
    maha = 0.5 * (((mean - mean_o) / std_o) ** 2).sum(-1)
    trace = ((std / std_o) ** 2).sum(-1)
    logdet = 2 * np.log(std).sum(-1)
    logdet_o = 2 * np.log(std_o).sum(-1)
    return maha, 0.5 * (trace - k + logdet_o - logdet)


def test_log_prob_matches_scipy_formula(dists):
    p, _ = dists
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, K)).astype(np.float32)
    lp = G.log_prob(p, jnp.asarray(x))
    # independent reference
    mean, std = np.asarray(p.mean), np.asarray(p.std)
    ref = (-0.5 * (((x - mean) / std) ** 2 + np.log(2 * np.pi) + 2 * np.log(std))).sum(-1)
    np.testing.assert_allclose(lp, ref, rtol=1e-4)


def test_entropy_matches_formula(dists):
    p, _ = dists
    std = np.asarray(p.std)
    ref = 0.5 * (K * np.log(2 * np.e * np.pi) + 2 * np.log(std).sum(-1))
    np.testing.assert_allclose(G.entropy(p), ref, rtol=1e-5)


def test_kl_parts_golden(dists):
    p, q = dists
    m, c = G.kl_parts(p, q)
    m_ref, c_ref = np_kl_parts(np.asarray(p.mean), np.asarray(p.std), np.asarray(q.mean), np.asarray(q.std))
    np.testing.assert_allclose(m, m_ref, rtol=1e-4)
    np.testing.assert_allclose(c, c_ref, rtol=1e-4, atol=1e-6)


def test_kl_zero_for_identical(dists):
    p, _ = dists
    assert float(jnp.abs(G.kl(p, p)).max()) < 1e-5


# ---------------------------------------------------------------------------
# mean projection
# ---------------------------------------------------------------------------


def test_mean_projection_satisfies_bound(dists):
    p, q = dists
    eps = 0.05
    maha_part, _ = G.kl_parts(p, q)
    proj = mean_projection(p.mean, q.mean, maha_part, eps)
    new_maha = 0.5 * G.maha(proj, q.mean, q.std)
    assert (np.asarray(new_maha) <= eps * (1 + 1e-3)).all()


def test_mean_projection_noop_inside_bound(dists):
    p, q = dists
    maha_part, _ = G.kl_parts(p, q)
    big_eps = float(maha_part.max()) * 2 + 1.0
    proj = mean_projection(p.mean, q.mean, maha_part, big_eps)
    np.testing.assert_allclose(proj, p.mean)


# ---------------------------------------------------------------------------
# KL diag covariance projection (vs numeric reference)
# ---------------------------------------------------------------------------


def np_kl_cov(var_p, var_q):
    r = var_p / var_q
    return 0.5 * (r - 1 - np.log(r)).sum(-1)


def np_diag_cov_projection(var, old_var, eps):
    """Reference solve of the ITPAL diag problem by dense bisection on eta."""
    out = np.empty_like(var)
    for b in range(var.shape[0]):
        if np_kl_cov(var[b : b + 1], old_var[b : b + 1])[0] <= eps:
            out[b] = var[b]
            continue
        lo, hi = 0.0, 1e14
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            v = (1 + mid) / (1 / var[b] + mid / old_var[b])
            if np_kl_cov(v[None], old_var[b : b + 1])[0] > eps:
                lo = mid
            else:
                hi = mid
        out[b] = (1 + lo) / (1 / var[b] + lo / old_var[b])
    return out


def test_kl_cov_projection_golden(dists):
    p, q = dists
    var = np.asarray(p.std, dtype=np.float64) ** 2
    old_var = np.asarray(q.std, dtype=np.float64) ** 2
    eps = 0.0025
    ref = np_diag_cov_projection(var, old_var, eps)
    proj = kl_diag_cov_projection(jnp.asarray(var, jnp.float32), jnp.asarray(old_var, jnp.float32), eps)
    np.testing.assert_allclose(proj, ref, rtol=2e-3)


def test_kl_cov_projection_satisfies_bound(dists):
    p, q = dists
    eps = 0.0025
    proj = kl_diag_cov_projection(p.std**2, q.std**2, eps)
    cons = np_kl_cov(np.asarray(proj), np.asarray(q.std) ** 2)
    assert (cons <= eps * (1 + 1e-2)).all()


def test_kl_cov_projection_noop_inside_bound(dists):
    p, _ = dists
    var = p.std**2
    old_var = var * 1.0001
    proj = kl_diag_cov_projection(var, old_var, 2.5e-3)
    np.testing.assert_allclose(proj, var, rtol=1e-5)


def test_kl_cov_projection_gradient_identity_when_inactive(dists):
    p, _ = dists
    var = p.std**2

    def f(v):
        return kl_diag_cov_projection(v, v * 1.0001, 2.5e-3).sum()

    g = jax.grad(f)(var)
    np.testing.assert_allclose(g, jnp.ones_like(g), atol=1e-4)


def test_kl_cov_projection_gradient_matches_fd(dists):
    """Implicit-function-theorem gradient vs central finite differences."""
    p, q = dists
    var = np.asarray(p.std, dtype=np.float64) ** 2 * 3.0  # force active constraint
    old_var = np.asarray(q.std, dtype=np.float64) ** 2
    eps = 0.0025

    def f(v):
        return kl_diag_cov_projection(v, jnp.asarray(old_var, jnp.float32), eps).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(var, jnp.float32)))

    h = 1e-4
    for (b, k) in [(0, 0), (3, 2), (7, 5)]:
        vp, vm = var.copy(), var.copy()
        vp[b, k] += h
        vm[b, k] -= h
        fd = (np_diag_cov_projection(vp, old_var, eps).sum() - np_diag_cov_projection(vm, old_var, eps).sum()) / (2 * h)
        assert abs(g[b, k] - fd) < 5e-2 * max(1.0, abs(fd)), (g[b, k], fd)


def test_kl_cov_projection_grad_flows_only_to_new_var(dists):
    p, q = dists

    def f(v, ov):
        return kl_diag_cov_projection(v, ov, 2.5e-3).sum()

    g_old = jax.grad(f, argnums=1)(p.std**2 * 3.0, q.std**2)
    np.testing.assert_allclose(g_old, 0.0)


# ---------------------------------------------------------------------------
# full projection layers
# ---------------------------------------------------------------------------


def test_kl_projection_layer_bounds(dists):
    p, q = dists
    layer = KLProjection(mean_bound=0.05, cov_bound=0.0025)
    proj = layer(p, q)
    m, c = G.kl_parts(proj, q)
    assert (np.asarray(m) <= 0.05 * 1.01).all()
    assert (np.asarray(c) <= 0.0025 * 1.02).all()


def test_frob_projection_layer_bounds(dists):
    p, q = dists
    layer = FrobeniusProjection(mean_bound=0.1, cov_bound=0.01, scale_prec=False)
    proj = layer(p, q)
    m, c = G.frobenius_parts(proj, q, scale_prec=False)
    assert (np.asarray(c) <= 0.01 * 1.05).all()


def test_w2_projection_layer_bounds(dists):
    p, q = dists
    layer = WassersteinProjection(mean_bound=0.1, cov_bound=0.01, scale_prec=False)
    proj = layer(p, q)
    _, c = G.wasserstein_parts(proj, q, scale_prec=False)
    assert (np.asarray(c) <= 0.01 * 1.05).all()


def test_base_projection_is_identity(dists):
    p, q = dists
    layer = BaseProjection()
    proj = layer(p, q)
    np.testing.assert_allclose(proj.mean, p.mean)
    np.testing.assert_allclose(proj.std, p.std)


def test_entropy_inequality_projection(dists):
    p, _ = dists
    beta = float(G.entropy(p).max()) + 1.0
    proj = entropy_inequality_projection(p, beta)
    np.testing.assert_allclose(G.entropy(proj), beta, rtol=1e-5)


def test_factory():
    assert isinstance(get_projection_layer("kl"), KLProjection)
    assert isinstance(get_projection_layer("frob"), FrobeniusProjection)
    assert isinstance(get_projection_layer("w2"), WassersteinProjection)
    assert isinstance(get_projection_layer("ppo"), BaseProjection)


def test_projection_layer_jit_and_grad(dists):
    """The whole projection must be jit-able and give finite gradients."""
    p, q = dists
    layer = KLProjection(mean_bound=0.05, cov_bound=0.0025)

    @jax.jit
    def loss(mean, std):
        proj = layer(G.DiagGaussian(mean, std), q)
        return G.kl(proj, q).mean() + layer.trust_region_loss(G.DiagGaussian(mean, std), proj)

    g_mean, g_std = jax.grad(loss, argnums=(0, 1))(p.mean, p.std)
    assert np.isfinite(np.asarray(g_mean)).all()
    assert np.isfinite(np.asarray(g_std)).all()


def test_papi_projection_joint_bound(dists):
    """PAPI enforces the JOINT bound on the EXPECTED KL over the batch."""
    from geometry_rl_tpu.rl.projections.papi import PAPIProjection

    p, q = dists
    layer = PAPIProjection(mean_bound=0.015, cov_bound=0.005, entropy_first=True)
    proj = layer(p, q)
    m, c = G.kl_parts(proj, q)
    joint = float(m.mean() + c.mean())
    assert joint <= (0.015 + 0.005) * 1.1, joint


def test_papi_noop_inside_bound(dists):
    from geometry_rl_tpu.rl.projections.papi import PAPIProjection

    p, _ = dists
    q = G.DiagGaussian(p.mean + 1e-4, p.std * 1.0001)
    layer = PAPIProjection(mean_bound=0.5, cov_bound=0.5, entropy_first=True)
    proj = layer(p, q)
    np.testing.assert_allclose(proj.mean, p.mean, atol=1e-5)
    np.testing.assert_allclose(proj.std, p.std, rtol=1e-4)


def test_papi_weight_update():
    from geometry_rl_tpu.rl.projections.papi import papi_weight_update

    new = {"w": jnp.ones((2, 2)) * 3.0}
    old = {"w": jnp.ones((2, 2))}
    out = papi_weight_update(new, old, 0.5)
    np.testing.assert_allclose(out["w"], 2.0)


def test_factory_papi_and_w2_non_com():
    from geometry_rl_tpu.rl.projections.papi import PAPIProjection

    assert isinstance(get_projection_layer("papi"), PAPIProjection)
    assert isinstance(get_projection_layer("w2_non_com"), WassersteinProjection)


# ---------------------------------------------------------------------------
# PAPI `_papi_steps` backtracking (papi_projection.py:151-245)
# ---------------------------------------------------------------------------


def _toy_mlp_policy(key, obs_dim=4, action_dim=2):
    from geometry_rl_tpu.models import MLPGaussianPolicy

    policy = MLPGaussianPolicy(action_dim=action_dim, hidden_dims=(16,), contextual_std=False)
    obs = jax.random.normal(key, (32, obs_dim))
    params = policy.init(jax.random.PRNGKey(0), None, obs)
    return policy, params, obs


def _perturb_mean_head(params, scale):
    """Shift the mean head so the expected KL to the original exceeds bounds."""
    import copy

    p = copy.deepcopy(params)
    p["params"]["mean"]["kernel"] = p["params"]["mean"]["kernel"] + scale
    p["params"]["mean"]["bias"] = p["params"]["mean"]["bias"] + scale
    return p


def test_papi_steps_backtracks_to_feasible_candidate():
    from geometry_rl_tpu.rl.projections.papi import papi_init_state, papi_steps

    policy, params0, obs = _toy_mlp_policy(jax.random.PRNGKey(1))
    apply_fn = lambda p: policy.apply(p, None, obs)  # noqa: E731
    q = apply_fn(params0)
    mean_bound, cov_bound = 0.05, 0.005

    # history holds the feasible old params; current violates the budget
    papi = papi_init_state(params0, history=4)
    papi = papi._replace(
        history=jax.tree_util.tree_map(lambda h, p: h.at[0].set(p), papi.history, params0),
        hist_len=jnp.ones((), jnp.int32),
    )
    current = _perturb_mean_head(params0, 0.7)
    m, c = G.kl_parts(apply_fn(current), q)
    assert float(m.mean() + c.mean()) > mean_bound + cov_bound  # setup sanity

    new_params, new_state, anneal, idx = papi_steps(
        apply_fn, current, papi, q, mean_bound, cov_bound,
        initial_entropy=jnp.asarray(float(G.entropy(q).mean())),
    )
    assert int(idx) == 1  # backtracked to the history entry, not current
    assert not bool(anneal)  # shallow backtrack: no LR annealing
    m2, c2 = G.kl_parts(apply_fn(new_params), q)
    # PAPI iterations land the policy (approximately) inside the joint budget
    assert float(m2.mean() + c2.mean()) <= (mean_bound + cov_bound) * 1.5
    # and strictly closer than the unprojected update
    assert float(m2.mean() + c2.mean()) < float(m.mean() + c.mean())
    # feasible round pushes the current params into the ring buffer
    assert int(new_state.hist_len) == 2
    pushed = jax.tree_util.tree_map(lambda h: h[0], new_state.history)
    np.testing.assert_allclose(
        np.asarray(pushed["params"]["mean"]["kernel"]),
        np.asarray(current["params"]["mean"]["kernel"]),
    )


def test_papi_steps_feasible_current_is_noop():
    from geometry_rl_tpu.rl.projections.papi import papi_init_state, papi_steps

    policy, params0, obs = _toy_mlp_policy(jax.random.PRNGKey(2))
    apply_fn = lambda p: policy.apply(p, None, obs)  # noqa: E731
    q = apply_fn(params0)
    papi = papi_init_state(params0, history=4)

    new_params, new_state, anneal, idx = papi_steps(
        apply_fn, params0, papi, q, 0.05, 0.005,
        initial_entropy=jnp.asarray(float(G.entropy(q).mean())),
    )
    assert int(idx) == 0 and not bool(anneal)
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["mean"]["kernel"]),
        np.asarray(params0["params"]["mean"]["kernel"]),
        atol=1e-5,
    )


def test_papi_steps_no_feasible_keeps_params_and_anneals():
    from geometry_rl_tpu.rl.projections.papi import papi_init_state, papi_steps

    policy, params0, obs = _toy_mlp_policy(jax.random.PRNGKey(3))
    apply_fn = lambda p: policy.apply(p, None, obs)  # noqa: E731
    q = apply_fn(params0)
    # empty history + violating current -> nothing feasible
    papi = papi_init_state(_perturb_mean_head(params0, 5.0), history=4)
    current = _perturb_mean_head(params0, 0.7)

    new_params, new_state, anneal, _ = papi_steps(
        apply_fn, current, papi, q, 0.05, 0.005,
        initial_entropy=jnp.asarray(float(G.entropy(q).mean())),
    )
    assert bool(anneal)
    assert int(new_state.hist_len) == 0  # poor policy is not kept in history
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["mean"]["kernel"]),
        np.asarray(current["params"]["mean"]["kernel"]),
    )


def test_papi_steps_requires_non_contextual_std():
    from geometry_rl_tpu.models import MLPGaussianPolicy
    from geometry_rl_tpu.rl.projections.papi import find_papi_paths

    policy = MLPGaussianPolicy(action_dim=2, hidden_dims=(8,), contextual_std=True)
    obs = jnp.zeros((4, 3))
    params = policy.init(jax.random.PRNGKey(0), None, obs)
    with pytest.raises(ValueError, match="non-contextual"):
        find_papi_paths(params)
