"""Robust-tube (Koller) baseline tests: Minkowski outer bound containment,
one-step tube soundness against sampled GP rollouts, Lipschitz estimator,
and explosion-freeze semantics (ref machinery:
benchmarking/robust_tube_based_GPMPC_koller.py:295-307)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarking"))

import robust_tube_baseline as rtb  # noqa: E402


def _load(param):
    import dataclasses

    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", param + ".yaml"))
    spec = dataclasses.replace(spec, ns=1)
    params["agent"]["num_dyn_samples"] = 1
    env = make_env(spec, params)
    hyp = GPHyperArrays.from_spec(spec.gp, jnp.float64)
    gp = agent_mod.init_gp_state(spec, env, jnp.float64, capacity=1)
    return params, spec, data, env, hyp, gp


def test_minkowski_outer_bound_contains_sum():
    rng = np.random.default_rng(0)
    A1 = rng.normal(size=(2, 2))
    A2 = rng.normal(size=(2, 2))
    Q1 = A1 @ A1.T + 0.1 * np.eye(2)
    Q2 = A2 @ A2.T + 0.1 * np.eye(2)
    Qs = np.asarray(rtb.minkowski_ellipsoid(jnp.asarray(Q1),
                                            jnp.asarray(Q2)))
    # support-function containment: h_{E1+E2}(d) = h_{E1}(d) + h_{E2}(d)
    # must not exceed h_{Es}(d) for every direction
    for t in np.linspace(0, np.pi, 17):
        d = np.array([np.cos(t), np.sin(t)])
        h_sum = np.sqrt(d @ Q1 @ d) + np.sqrt(d @ Q2 @ d)
        h_out = np.sqrt(d @ Qs @ d)
        assert h_out >= h_sum - 1e-9
    # degenerate partner collapses to the other ellipsoid
    Z = jnp.zeros((2, 2))
    assert np.allclose(rtb.minkowski_ellipsoid(jnp.asarray(Q1), Z), Q1)
    assert np.allclose(rtb.minkowski_ellipsoid(Z, jnp.asarray(Q2)), Q2)


def test_pairwise_lipschitz_linear_function():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform(-1, 1, size=(30, 2)))
    W = jnp.asarray([[2.0, 0.0], [0.0, -1.0]])
    F = X @ W.T
    L = float(rtb.pairwise_lipschitz(X, F))
    # ||W||_2 = 2; the pairwise estimator lower-bounds and approaches it
    assert 1.5 < L <= 2.0 + 1e-6


def test_tube_contains_sampled_rollouts_early_stages():
    """Sampled GP dynamics trajectories stay inside the Koller ellipsoids
    over the first stages (soundness of the one-step over-approximation)."""
    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.reachability import forward_sample_rollout

    params, spec, data, env, hyp, gp = _load("params_pendulum1D_samples")
    T = 5
    U = jnp.zeros((T, spec.nu), jnp.float64)
    x0 = jnp.asarray(data.start, jnp.float64)
    k_fb = np.zeros((spec.nu, spec.nx))
    l_mu = jnp.full((spec.nx,), 0.5)
    l_sig = jnp.full((spec.nx,), 0.5)
    cs, Qs, _ = rtb.propagate_tube(spec, env, hyp, gp, x0, U, k_fb,
                                   jnp.asarray(data.goal, jnp.float64),
                                   l_mu, l_sig, spec.gp.beta)

    import dataclasses
    spec_fs = dataclasses.replace(spec, ns=16)
    params_fs = dict(params)
    gp_fs = agent_mod.init_gp_state(spec_fs, env, jnp.float64, capacity=T)
    X, _ = forward_sample_rollout(spec_fs, env, hyp, gp_fs, x0, U,
                                  jax.random.PRNGKey(0))
    X = np.asarray(X)                       # (T+1, ns, nx)
    for t in range(1, T + 1):
        Qinv = np.linalg.pinv(np.asarray(Qs[t]))
        d = X[t] - np.asarray(cs[t])[None]
        lvl = np.einsum("si,ij,sj->s", d, Qinv, d)
        # beta=2.5 tube: allow the loosest few samples some slack but the
        # bulk must be inside the unit level set
        assert np.quantile(lvl, 0.9) <= 1.0 + 1e-6, (t, np.sort(lvl)[-3:])


def test_explosion_freezes_not_nan():
    params, spec, data, env, hyp, gp = _load("params_pendulum1D_samples")
    T = 25
    U = jnp.zeros((T, spec.nu), jnp.float64)
    x0 = jnp.asarray(data.start, jnp.float64)
    # huge Lipschitz constants force the quadratic blow-up within T steps
    l = jnp.full((spec.nx,), 5.0)
    cs, Qs, _ = rtb.propagate_tube(spec, env, hyp, gp, x0, U,
                                   np.zeros((spec.nu, spec.nx)),
                                   jnp.asarray(data.goal, jnp.float64),
                                   l, l, spec.gp.beta)
    assert np.all(np.isfinite(np.asarray(Qs)))
    assert np.all(np.isfinite(np.asarray(cs)))
    tr = np.trace(np.asarray(Qs), axis1=1, axis2=2)
    assert tr[-1] > 1e6          # it did explode...
    assert tr[-1] == tr[-2]      # ...and then froze


def test_ellipse_polyline_geometry():
    Q = np.diag([4.0, 1.0])
    poly = rtb.ellipse_polyline(np.array([1.0, 2.0]), Q, n=64)
    assert poly.shape == (2, 64)
    # extreme angles fall between polyline nodes; 64 nodes -> ~1e-3 sag
    assert np.max(poly[0]) == pytest.approx(3.0, abs=1e-2)
    assert np.max(poly[1]) == pytest.approx(3.0, abs=1e-2)
