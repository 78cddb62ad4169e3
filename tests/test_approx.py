"""Approximate sampling MPC (BLR + sampled tightenings) tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from sampling_gpmpc_tpu.approx import blr
from sampling_gpmpc_tpu.approx.drone import DroneModel
from sampling_gpmpc_tpu.approx.solver import ApproxMPC


@pytest.fixture(scope="module")
def params(params_dir):
    return yaml.safe_load(open(os.path.join(
        params_dir, "params_drone_obstacles_approx.yaml")))


def test_blr_mean_model_predicts_true_dynamics(params):
    """The drone dynamics are exactly linear in the features, so the ridge
    posterior mean must reproduce the true next states — on the training
    grid and on held-out random points.  (Raw weights are not compared:
    the coarse phi grid {-pi, 0, pi} makes the sin(phi) feature column
    nearly zero, leaving individual weights ill-identified, exactly as in
    the reference's setup.)"""
    model = DroneModel(params)
    X, Y = model.training_grid()
    post = blr.fit(model.features(), X, Y, 1e-7, 2e-7)
    step, _ = blr.make_dynamics(model.features(), model.nx)

    rng = np.random.default_rng(0)
    X_val = rng.uniform(-1, 1, size=(50, 8))
    pred = np.asarray(jax.vmap(
        lambda z: step(z[:6], z[6:], post.mu))(jnp.asarray(X_val)))
    truth = np.asarray(jax.vmap(
        lambda z: model.discrete_dyn(z[:6], z[6:]))(jnp.asarray(X_val)))
    np.testing.assert_allclose(pred, truth, atol=2e-3)


def test_blr_dynamics_match_true_model(params):
    model = DroneModel(params)
    step, val_jac = blr.make_dynamics(model.features(), model.nx)
    W = jnp.zeros((6, 6))
    for j, w in enumerate(model.gt_weights()):
        W = W.at[j, :len(w)].set(jnp.asarray(w))
    x = jnp.asarray([0.3, -0.2, 0.1, 0.5, -0.4, 0.2])
    u = jnp.asarray([1.0, 2.0])
    np.testing.assert_allclose(np.asarray(step(x, u, W)),
                               np.asarray(model.discrete_dyn(x, u)),
                               rtol=1e-12)
    vj = val_jac(x, u, W)
    J = jax.jacfwd(lambda z: model.discrete_dyn(z[:6], z[6:]))(
        jnp.concatenate([x, u]))
    np.testing.assert_allclose(np.asarray(vj[:, 1:]), np.asarray(J),
                               rtol=1e-9, atol=1e-12)


def test_tightening_grows_with_horizon(params):
    mpc = ApproxMPC(params)
    x0 = jnp.asarray(params["env"]["start"], jnp.float64)
    U = jnp.zeros((mpc.H, mpc.nu), jnp.float64) + 2.0
    delta = mpc._tighten(x0, U, jax.random.PRNGKey(0), mpc.post,
                         mpc.W_nominal)
    delta = np.asarray(delta)
    assert delta.shape == (mpc.H + 1, mpc.nx)
    assert np.allclose(delta[0], 0.0)
    assert delta[1:].max() > 0
    # uncertainty accumulates along the horizon
    assert delta[-1].max() > delta[1].max()


def test_closed_loop_tracks_and_avoids(params):
    mpc = ApproxMPC(params)
    out = mpc.run(num_iters=12)
    assert out["status"] == 0
    ph = np.stack(out["physical_state_traj"])
    path = mpc.model.path_generator(0, 200)
    # moves (tracking the path), stays in bounds, avoids obstacles
    assert np.linalg.norm(ph[-1, :2] - ph[0, :2]) > 0.3
    assert np.all(np.abs(ph[:, :2]) <= 5.0 + 1e-6)
    for (cx, cy, r) in np.asarray(mpc.obstacles):
        d = np.sqrt((ph[:, 0] - cx) ** 2 + (ph[:, 1] - cy) ** 2)
        assert d.min() > r - 0.05, "obstacle violated in closed loop"


def test_active_learning_rank1_matches_batch_refit(params):
    """stats_update + posterior == batch fit on the augmented dataset —
    the conjugacy identity the online path relies on."""
    model = DroneModel(params)
    feats = model.features()
    X, Y = model.training_grid()
    lam, nv = 1e-6, 2e-7
    stats = blr.stats_fit(feats, X, Y, lam)

    rng = np.random.default_rng(3)
    xu_new = rng.uniform(-1, 1, size=(3, 8))
    y_new = np.asarray(jax.vmap(
        lambda z: model.discrete_dyn(z[:6], z[6:]))(jnp.asarray(xu_new)))
    for k in range(3):
        stats = blr.stats_update(stats, feats, xu_new[k, :6],
                                 xu_new[k, 6:], y_new[k])
    post_inc = blr.posterior_from_stats(stats, nv)

    post_batch = blr.fit(feats, np.vstack([X, xu_new]),
                         np.vstack([Y, y_new]), lam, nv)
    np.testing.assert_allclose(np.asarray(post_inc.mu),
                               np.asarray(post_batch.mu), atol=1e-9)
    np.testing.assert_allclose(np.asarray(post_inc.chol),
                               np.asarray(post_batch.chol), atol=1e-9)


def test_active_learning_closed_loop(params):
    """active_learning.use: the posterior absorbs observed transitions —
    precision grows, predictive error at the observed points drops, and
    the closed loop still tracks (ref: DEMPC.py:75-81)."""
    import copy
    p = copy.deepcopy(params)
    p["common"]["active_learning"] = {"use": True, "frequency": 2}
    mpc = ApproxMPC(p)
    assert mpc.al_use and mpc.al_freq == 2
    tr_pre = [np.trace(A) for A in mpc._stats.A]
    sig_pre = np.asarray(jax.vmap(jnp.diagonal)(jnp.einsum(
        "jab,jcb->jac", mpc.post.chol, mpc.post.chol))).sum()

    out = mpc.run(num_iters=8)
    assert out["status"] == 0
    # 8 steps at frequency 2 -> 4 observations absorbed
    tr_post = [np.trace(A) for A in mpc._stats.A]
    assert all(t1 > t0 for t0, t1 in zip(tr_pre, tr_post))
    sig_post = np.asarray(jax.vmap(jnp.diagonal)(jnp.einsum(
        "jab,jcb->jac", mpc.post.chol, mpc.post.chol))).sum()
    assert sig_post < sig_pre          # posterior strictly sharpened
    # nominal weights track the refreshed posterior mean
    np.testing.assert_array_equal(np.asarray(mpc.W_nominal),
                                  np.asarray(mpc.post.mu))


def test_optimistic_closed_loop(params):
    """run.optimistic without pessimistic drives the loop through the
    eta-augmented exploration OCP (ref DEMPC.py:56-61)."""
    import copy
    p = copy.deepcopy(params)
    p["agent"]["run"]["optimistic"] = True
    p["agent"]["run"]["pessimistic"] = False
    p["optimizer"]["SEMPC"]["max_sqp_iter"] = 2
    mpc = ApproxMPC(p)
    out = mpc.run(num_iters=3)
    assert out["status"] == 0
    ph = np.stack(out["physical_state_traj"])
    assert np.all(np.isfinite(ph))
    # optimistic mode plans without tightenings
    assert np.allclose(np.stack(out["tightenings"]), 0.0)


def test_optimistic_plan(params):
    """Optimistic planning: eta within [-1,1] picks favorable dynamics; the
    optimistic plan must track the path at least as well as the nominal."""
    mpc = ApproxMPC(params)
    x0 = np.asarray(params["env"]["start"])
    X, U, status = mpc.solve_optimistic(x0, max_sqp_iter=3)
    assert status == 0
    X = np.asarray(X)
    U = np.asarray(U)
    # eta bounded
    assert np.all(U[:, mpc.nu:] <= 1.0 + 1e-6)
    assert np.all(U[:, mpc.nu:] >= -1.0 - 1e-6)
    # state box respected, plan moves along the path
    assert np.all(X >= np.asarray(params["optimizer"]["x_min"])[None] - 1e-4)
    assert np.all(X <= np.asarray(params["optimizer"]["x_max"])[None] + 1e-4)
    # the plan tracks the per-stage path reference better than staying put
    path = mpc.model.path_generator(0)
    err_plan = np.linalg.norm(X[:, :2] - path, axis=1).mean()
    err_stay = np.linalg.norm(x0[None, :2] - path, axis=1).mean()
    assert err_plan < err_stay
