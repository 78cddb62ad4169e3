"""Design-tool tests: MLE recovery, Lipschitz estimation, terminal-set
synthesis sanity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sampling_gpmpc_tpu.config import load_problem
from sampling_gpmpc_tpu.envs import make_env
from sampling_gpmpc_tpu.gp.kernel import rbf_grad
from sampling_gpmpc_tpu.tools.lipschitz import estimate_lipschitz, grid_around
from sampling_gpmpc_tpu.tools.mle import fit_gp_hyperparameters
from sampling_gpmpc_tpu.tools.terminal_set import synthesize


def test_mle_recovers_lengthscale():
    """Data drawn from a known derivative-GP prior: MLE should recover the
    generating lengthscale to ~20%."""
    rng = np.random.default_rng(0)
    true_ls = np.array([0.8, 1.3])
    true_os = 0.5
    Z = rng.uniform(-2, 2, size=(40, 2))
    K = np.asarray(rbf_grad(jnp.asarray(Z), jnp.asarray(Z), true_ls, true_os))
    L = np.linalg.cholesky(K + 1e-8 * np.eye(K.shape[0]))
    y = (L @ rng.normal(size=K.shape[0])).reshape(40, 3)

    fit = fit_gp_hyperparameters(Z, y, iters=400,
                                 init={"lengthscale": np.ones(2),
                                       "outputscale": 1.0})
    np.testing.assert_allclose(fit["lengthscale"], true_ls, rtol=0.25)
    assert 0.2 < fit["outputscale"] < 1.2


@pytest.fixture(scope="module")
def pend_env(params_dir):
    params, spec, data = load_problem(
        os.path.join(params_dir, "params_pendulum1D_samples.yaml"))
    return params, spec, data, make_env(spec, params)


def test_lipschitz_estimate_near_config_value(pend_env):
    """The estimated closed-loop contraction for pendulum1D with the config
    (P, K) should land near the published Lipschitz constant 0.96."""
    params, spec, data, env = pend_env
    grid = grid_around([2.1, -2.5, -5.0], [3.6, 2.5, 5.0], 7)
    # config-convention gain (closed loop A + B K)
    L = estimate_lipschitz(env, data.P_term, data.K_fb,
                           grid[:, :2], grid[:, 2:])
    assert 0.8 < L < 1.1, L


def test_terminal_set_synthesis(pend_env):
    params, spec, data, env = pend_env
    ts = synthesize(env, data.goal, np.zeros(spec.nu),
                    np.diag([10.0, 15.0]), np.diag([0.9]),
                    data.x_min, data.x_max, data.u_min, data.u_max)
    assert ts.rho < 1.0, "closed loop not contractive at equilibrium"
    assert ts.delta > 0
    # local invariance: a state well inside the ellipse maps strictly
    # inward under the ancillary feedback (the Riccati decrease is a local
    # guarantee; the full-ellipse certificate is the rho < 1 vertex check)
    w, V = np.linalg.eigh(ts.P)
    x_b = data.goal + V[:, 0] / np.sqrt(w[0]) * ts.delta * 0.3
    u = -ts.K @ (data.goal - x_b)   # config convention: u = -K(x_eq - x)
    x_n = np.asarray(env.discrete_dyn(jnp.asarray(x_b), jnp.asarray(u)))
    v_b = (x_b - data.goal) @ ts.P @ (x_b - data.goal)
    v_n = (x_n - data.goal) @ ts.P @ (x_n - data.goal)
    assert v_n < v_b


def test_sample_complexity_calculators():
    from sampling_gpmpc_tpu.tools.sample_complexity import (
        epsilon_for_probability, info_beta, num_samples_for_coverage,
        rkhs_norm, small_ball_probability)
    rng = np.random.default_rng(0)
    Z = rng.uniform(-1, 1, size=(20, 2))
    y = np.sin(Z[:, 0]) * np.cos(Z[:, 1])
    grid = rng.uniform(-1, 1, size=(30, 2))
    ls, os_, lam = np.array([0.7, 0.7]), 0.5, 1e-4

    n = rkhs_norm(Z, y, ls, os_, lam)
    assert n > 0
    b = info_beta(Z, ls, os_, lam)
    assert b > 1

    # monotonicity: bigger eps -> bigger probability
    p1 = small_ball_probability(Z, y, grid, ls, os_, lam, 0.01, 500)
    p2 = small_ball_probability(Z, y, grid, ls, os_, lam, 0.5, 500)
    assert p2 >= p1
    assert 0.0 <= p1 <= 1.0 and p2 > 0.5

    e90 = epsilon_for_probability(Z, y, grid, ls, os_, lam, 0.9, 500)
    p_chk = small_ball_probability(Z, y, grid, ls, os_, lam, e90, 500)
    assert abs(p_chk - 0.9) < 0.1

    assert num_samples_for_coverage(0.5, 0.05) == 5
    assert num_samples_for_coverage(1.0) == 1


def test_change_of_measure_pipeline():
    """Full epsilon(N) machinery on the pendulum1D config with tiny MC:
    C_D assembles from its terms, N(delta) is finite, and the headline
    count lands near the config's ns=70 (ref: num_of_samples.py:69 run on
    params_pendulum1D_samples, which ships num_dyn_samples=70)."""
    from sampling_gpmpc_tpu.tools import num_of_samples as nos
    from sampling_gpmpc_tpu.tools import sample_complexity as sc

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", "params_pendulum1D_samples.yaml"))
    res = nos.run(params, spec, data, n_mc=20000, n_grid_max=8,
                  dense_factor=4)
    cd = res["Cd"]
    assert cd["Cd"] == pytest.approx(
        cd["true_norm"] + cd["mean_norm"] - cd["cross"]
        + cd["alpha_l1"] * params["agent"]["tight"]["w_bound"]
        + 0.5 * cd["fit_term"])
    assert 0.0 < res["p_ball"] <= 1.0
    assert 30 < res["num_samples"] < 150   # config ships ns=70
    # quantile curves grow with coverage probability
    for n_idx in range(len(res["grids"])):
        e50 = res["eps_curves"][0.5][n_idx]
        e90 = res["eps_curves"][0.9][n_idx]
        assert e90 >= e50 > 0

    # chunked and one-shot draws agree in distribution (same factor)
    Z, y = nos._train_values(params, spec, 0)
    hyp = spec.gp
    grid = sc.gp_input_grid(spec, data, 3)
    k = jax.random.PRNGKey(7)
    d1 = sc.max_deviation_samples_chunked(
        Z, y, grid, np.asarray(hyp.lengthscale[0]), hyp.outputscale[0],
        hyp.noise, 4000, k, chunk=512)
    d2 = sc.max_deviation_samples(
        Z, y, grid, np.asarray(hyp.lengthscale[0]), hyp.outputscale[0],
        hyp.noise, 4000, k)
    assert abs(np.median(d1) - np.median(d2)) < 0.2 * np.median(d2)


def test_measure_shift_count_formula():
    from sampling_gpmpc_tpu.tools.sample_complexity import (
        num_samples_with_measure_shift)
    # Cd = 0 reduces to the plain coverage bound
    assert num_samples_with_measure_shift(0.0, 0.5, 0.05) == pytest.approx(
        np.log(0.05) / np.log(0.5))
    # larger Cd -> more samples
    assert (num_samples_with_measure_shift(1.0, 0.5, 0.05)
            > num_samples_with_measure_shift(0.0, 0.5, 0.05))
    assert num_samples_with_measure_shift(0.0, 0.0) == float("inf")


def test_lmi_terminal_set_beats_riccati():
    """min -logdet LMI synthesis (ref: extra/pendulum_mpi.py:106-165):
    the optimized invariant ellipse must satisfy the same certificate as
    the Riccati route but with strictly larger volume, and respect the
    state/input boxes."""
    from sampling_gpmpc_tpu.tools.terminal_set import (synthesize,
                                                       synthesize_lmi)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", "params_pendulum1D_samples.yaml"))
    env = make_env(spec, params)
    x_eq, u_eq = data.goal, np.zeros(spec.nu)
    rng = np.random.default_rng(0)
    pts = (np.concatenate([x_eq, u_eq])[None]
           + 0.1 * rng.normal(size=(12, spec.nx + spec.nu)))
    rho = 0.995

    ts = synthesize_lmi(env, x_eq, u_eq, rho=rho, x_min=data.x_min,
                        x_max=data.x_max, u_min=data.u_min,
                        u_max=data.u_max, vertices=pts)
    ts_r = synthesize(env, x_eq, u_eq, np.eye(spec.nx), np.eye(spec.nu),
                      data.x_min, data.x_max, data.u_min, data.u_max,
                      vertices=pts)

    # certificate holds on the vertex set (constraint is active at the
    # optimum, so allow solver slack)
    assert ts.rho <= rho + 1e-6
    vol = np.pi / np.sqrt(np.linalg.det(ts.P))
    vol_r = np.pi * ts_r.delta ** 2 / np.sqrt(np.linalg.det(ts_r.P))
    assert vol > vol_r * 1.5

    # containment: ellipse support along e_i inside the state box, and
    # the feedback input K x over the ellipse inside the input box
    E = np.linalg.inv(ts.P)
    bx = np.minimum(data.x_max - x_eq, x_eq - data.x_min)
    assert np.all(np.sqrt(np.diag(E)) <= bx + 1e-8)
    bu = np.minimum(data.u_max - u_eq, u_eq - data.u_min)
    quad = np.sqrt(np.diag(ts.K @ E @ ts.K.T))
    assert np.all(quad <= bu + 1e-8)
