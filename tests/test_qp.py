"""QP and condensing tests against scipy / brute-force oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from sampling_gpmpc_tpu.ocp.condense import condense, condense_single
from sampling_gpmpc_tpu.ocp.qp import boxes_to_rows, solve_qp


def test_condense_matches_rollout():
    rng = np.random.default_rng(0)
    ns, H, nx, nu = 3, 6, 4, 2
    A = rng.normal(size=(ns, H, nx, nx)) * 0.4
    B = rng.normal(size=(ns, H, nx, nu))
    r = rng.normal(size=(ns, H, nx))
    dx0 = rng.normal(size=(ns, nx))
    dU = rng.normal(size=(H * nu,))

    T, G = condense(jnp.asarray(A), jnp.asarray(B), jnp.asarray(r),
                    jnp.asarray(dx0))
    assert T.shape == (ns, H + 1, nx) and G.shape == (ns, H + 1, nx, H * nu)

    for i in range(ns):
        x = dx0[i]
        np.testing.assert_allclose(np.asarray(T[i, 0] + G[i, 0] @ dU), x,
                                   atol=1e-12)
        for k in range(H):
            u_k = dU[k * nu:(k + 1) * nu]
            x = A[i, k] @ x + B[i, k] @ u_k + r[i, k]
            np.testing.assert_allclose(
                np.asarray(T[i, k + 1] + G[i, k + 1] @ dU), x, atol=1e-10)


def _oracle_qp(P, q, C, d):
    n = q.shape[0]
    res = scipy.optimize.minimize(
        lambda z: 0.5 * z @ P @ z + q @ z, np.zeros(n), jac=lambda z: P @ z + q,
        constraints=[{"type": "ineq", "fun": lambda z: d - C @ z,
                      "jac": lambda z: -C}],
        method="SLSQP", options={"maxiter": 300, "ftol": 1e-12})
    return res.x


def test_qp_unconstrained_solution():
    rng = np.random.default_rng(1)
    n = 8
    Phalf = rng.normal(size=(n, n))
    P = Phalf @ Phalf.T + np.eye(n)
    q = rng.normal(size=n)
    C = np.zeros((1, n))
    d = np.array([1e8])
    sol = solve_qp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(C), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(sol.z), -np.linalg.solve(P, q),
                               atol=1e-7)
    assert int(sol.status) == 0


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_qp_matches_scipy_oracle(seed):
    rng = np.random.default_rng(seed)
    n, m = 10, 25
    Phalf = rng.normal(size=(n, n))
    P = Phalf @ Phalf.T + 0.5 * np.eye(n)
    q = rng.normal(size=n) * 2
    C = rng.normal(size=(m, n))
    d = rng.uniform(0.05, 1.0, size=m)  # feasible at 0
    sol = solve_qp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(C), jnp.asarray(d))
    z_ref = _oracle_qp(P, q, C, d)
    assert int(sol.status) == 0
    np.testing.assert_allclose(np.asarray(sol.z), z_ref, atol=5e-6)


def test_qp_with_big_bounds_inactive():
    """+/-1e8 pseudo-infinite rows must not perturb the solution."""
    rng = np.random.default_rng(5)
    n = 6
    P = np.eye(n)
    q = rng.normal(size=n)
    G = np.eye(n)
    C, d = boxes_to_rows(jnp.asarray(G), jnp.asarray(-1e8 * np.ones(n)),
                         jnp.asarray(1e8 * np.ones(n)))
    sol = solve_qp(jnp.asarray(P), jnp.asarray(q), C, d)
    np.testing.assert_allclose(np.asarray(sol.z), -q, atol=1e-6)


def test_qp_active_box():
    P = np.eye(2)
    q = np.array([-10.0, 0.3])
    C, d = boxes_to_rows(jnp.eye(2), jnp.asarray([-1.0, -1.0]),
                         jnp.asarray([1.0, 1.0]))
    sol = solve_qp(jnp.asarray(P), jnp.asarray(q), C, d)
    np.testing.assert_allclose(np.asarray(sol.z), [1.0, -0.3], atol=1e-7)


def _soft_oracle(H, g, G_h, d_h, G_s, lo, hi, zl, zu, Zl, Zu):
    """Generic-formulation oracle: slacks as explicit variables via SLSQP."""
    nU = g.shape[0]
    m = lo.shape[0]

    def unpack(z):
        return z[:nU], z[nU:nU + m], z[nU + m:]

    def f(z):
        u, sl, su = unpack(z)
        return (0.5 * u @ H @ u + g @ u + zl @ sl + 0.5 * sl @ (Zl * sl)
                + zu @ su + 0.5 * su @ (Zu * su))

    cons = [
        {"type": "ineq", "fun": lambda z: d_h - G_h @ unpack(z)[0]},
        {"type": "ineq",
         "fun": lambda z: hi + unpack(z)[2] - G_s @ unpack(z)[0]},
        {"type": "ineq",
         "fun": lambda z: G_s @ unpack(z)[0] + unpack(z)[1] - lo},
        {"type": "ineq", "fun": lambda z: unpack(z)[1]},
        {"type": "ineq", "fun": lambda z: unpack(z)[2]},
    ]
    res = scipy.optimize.minimize(f, np.zeros(nU + 2 * m), constraints=cons,
                                  method="SLSQP",
                                  options={"maxiter": 500, "ftol": 1e-12})
    return res.x[:nU]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_soft_qp_matches_oracle(seed):
    from sampling_gpmpc_tpu.ocp.qp import solve_qp_soft
    rng = np.random.default_rng(seed)
    nU, mh, ms = 6, 10, 5
    Hh = rng.normal(size=(nU, nU))
    H = Hh @ Hh.T + np.eye(nU)
    g = rng.normal(size=nU) * 3
    G_h = rng.normal(size=(mh, nU))
    d_h = rng.uniform(0.1, 1.5, size=mh)
    G_s = rng.normal(size=(ms, nU))
    lo = rng.uniform(-0.5, -0.1, size=ms)
    hi = rng.uniform(0.05, 0.3, size=ms)   # tight: slacks get used
    zl = np.full(ms, 3.0)
    zu = np.full(ms, 2.0)
    Zl = np.full(ms, 5.0)
    Zu = np.full(ms, 4.0)

    sol = solve_qp_soft(*map(jnp.asarray, (H, g, G_h, d_h, G_s, lo, hi,
                                           zl, zu, Zl, Zu)))
    u_ref = _soft_oracle(H, g, G_h, d_h, G_s, lo, hi, zl, zu, Zl, Zu)
    assert int(sol.status) == 0, float(sol.gap)
    np.testing.assert_allclose(np.asarray(sol.z), u_ref, atol=2e-5)


def test_soft_qp_no_soft_rows_matches_hard():
    from sampling_gpmpc_tpu.ocp.qp import solve_qp_soft
    rng = np.random.default_rng(7)
    nU, mh = 5, 12
    H = np.eye(nU) * 2
    g = rng.normal(size=nU)
    G_h = rng.normal(size=(mh, nU))
    d_h = rng.uniform(0.1, 1.0, size=mh)
    empty = np.zeros((0,))
    sol = solve_qp_soft(
        jnp.asarray(H), jnp.asarray(g), jnp.asarray(G_h), jnp.asarray(d_h),
        jnp.zeros((0, nU)), empty, empty, empty, empty, empty, empty)
    ref = solve_qp(jnp.asarray(H), jnp.asarray(g), jnp.asarray(G_h),
                   jnp.asarray(d_h))
    assert int(sol.status) == 0
    np.testing.assert_allclose(np.asarray(sol.z), np.asarray(ref.z),
                               atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_soft_qp_warm_start_correctness(seed):
    """Warm-started re-solve of a perturbed problem: same solution as a cold
    solve, never more than a couple of extra IPM iterations, and garbage
    carries gated back to the exact cold path (the HPIPM warm-start
    capability, ref: src/utils/ocp.py:310).  The iteration-count WIN is
    asserted on the real pipeline in test_warm_start_reduces_pipeline_iters
    — random dense QPs are not the workload the scheme is tuned for."""
    from sampling_gpmpc_tpu.ocp.qp import solve_qp_soft
    rng = np.random.default_rng(seed)
    nU, mh, ms = 6, 10, 5
    Hh = rng.normal(size=(nU, nU))
    H = Hh @ Hh.T + np.eye(nU)
    g = rng.normal(size=nU) * 3
    G_h = rng.normal(size=(mh, nU))
    d_h = rng.uniform(0.1, 1.5, size=mh)
    G_s = rng.normal(size=(ms, nU))
    lo = rng.uniform(-0.5, -0.1, size=ms)
    hi = rng.uniform(0.05, 0.3, size=ms)
    zl, zu = np.full(ms, 3.0), np.full(ms, 2.0)
    Zl, Zu = np.full(ms, 5.0), np.full(ms, 4.0)
    args = list(map(jnp.asarray, (H, g, G_h, d_h, G_s, lo, hi,
                                  zl, zu, Zl, Zu)))
    sol0 = solve_qp_soft(*args)
    assert int(sol0.status) == 0

    # small perturbation of the gradient + bounds (an SQP re-linearization)
    args2 = list(args)
    args2[1] = args[1] + 1e-3
    args2[3] = args[3] * (1.0 + 1e-3)
    cold = solve_qp_soft(*args2)
    warm = solve_qp_soft(*args2, ws=sol0.state, ws_valid=jnp.asarray(True))
    assert int(warm.status) == 0
    np.testing.assert_allclose(np.asarray(warm.z), np.asarray(cold.z),
                               atol=5e-6)
    # bounded downside on off-workload problems
    assert int(warm.iters) <= int(cold.iters) + 3, (
        f"warm {int(warm.iters)} >> cold {int(cold.iters)}")

    # a garbage warm state must be rejected by the residual gate and
    # reproduce the cold path exactly
    bad = tuple(jnp.ones_like(v) * 37.0 for v in sol0.state)
    gated = solve_qp_soft(*args2, ws=bad, ws_valid=jnp.asarray(True))
    assert int(gated.status) == 0
    np.testing.assert_allclose(np.asarray(gated.z), np.asarray(cold.z),
                               atol=5e-6)


def test_warm_start_reduces_pipeline_iters():
    """The VERDICT-#2 acceptance check on the real workload: carrying the
    PDIP state across SQP/MPC iterations cuts cumulative IPM iterations by
    >10 % over a pendulum1D closed loop, with a final state matching the
    cold-start run to QP-tolerance noise."""
    import dataclasses
    import os

    import jax

    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.dempc import shift_solution
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.ocp import sqp
    from sampling_gpmpc_tpu.ocp.spec import make_ocp_data

    pdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "params")
    params, spec, data = load_problem(
        os.path.join(pdir, "params_pendulum1D_samples.yaml"))
    # enough MPC steps to get past the transient: warm starting pays in
    # the steady-state regime (carried duals near-optimal); the first few
    # transient steps are roughly iteration-neutral under the relative
    # primal-residual metric
    spec = dataclasses.replace(spec, ns=8, num_mpc_iter=24)
    params["agent"]["num_dyn_samples"] = 8
    env = make_env(spec, params)
    dtype = jnp.float64
    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    solve = jax.jit(lambda st, X, U, gp, e, ws, wv: sqp.solve(
        spec, env, hyp, ocp, st, X, U, gp, e, qp_ws=ws, qp_valid=wv))

    def run(use_ws):
        gp = agent_mod.init_gp_state(spec, env, dtype)
        eps = agent_mod.make_epistemic(
            jax.random.PRNGKey(spec.seed), spec, dtype)
        X, U = sqp.init_iterate(spec, dtype, data.start)
        x = jnp.asarray(data.start, dtype)
        ws, wv = sqp.init_qp_ws(spec, dtype), jnp.asarray(False)
        tot = 0
        for m in range(spec.num_mpc_iter):
            st = solve(x, X, U, gp, eps[m], ws, wv)
            if use_ws:
                ws, wv = st.qp_ws, st.qp_valid
            tot += int(st.qp_iters)
            X, U, gp = st.X, st.U, st.gp
            u0 = U[0]
            if spec.use_feedback:
                u0 = u0 - (jnp.asarray(data.goal, dtype) - x) @ jnp.asarray(
                    data.K_fb, dtype).T
            x = env.discrete_dyn(x, u0)
            if spec.shift_soln:
                X, U = shift_solution(spec, X, U)
        return tot, np.asarray(x)

    cold_iters, x_cold = run(False)
    warm_iters, x_warm = run(True)
    assert warm_iters < 0.9 * cold_iters, (
        f"warm {warm_iters} vs cold {cold_iters}")
    np.testing.assert_allclose(x_warm, x_cold, atol=1e-3)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_qp_matches_jax(seed):
    """Cross-implementation check: the C++ solver and the XLA solver agree."""
    from sampling_gpmpc_tpu.native import solve_qp_soft_native
    from sampling_gpmpc_tpu.ocp.qp import solve_qp_soft
    rng = np.random.default_rng(seed + 100)
    nU, mh, ms = 8, 14, 6
    Hh = rng.normal(size=(nU, nU))
    H = Hh @ Hh.T + np.eye(nU)
    g = rng.normal(size=nU) * 3
    G_h = rng.normal(size=(mh, nU))
    d_h = rng.uniform(0.1, 1.5, size=mh)
    G_s = rng.normal(size=(ms, nU))
    lo = rng.uniform(-0.5, -0.1, size=ms)
    hi = rng.uniform(0.05, 0.3, size=ms)
    zl = np.full(ms, 3.0); zu = np.full(ms, 2.0)
    Zl = np.full(ms, 5.0); Zu = np.full(ms, 4.0)

    u_n, gap, iters, status = solve_qp_soft_native(
        H, g, G_h, d_h, G_s, lo, hi, zl, zu, Zl, Zu)
    sol = solve_qp_soft(*map(jnp.asarray, (H, g, G_h, d_h, G_s, lo, hi,
                                           zl, zu, Zl, Zu)))
    assert status == 0 and int(sol.status) == 0
    np.testing.assert_allclose(u_n, np.asarray(sol.z), atol=1e-5)


def test_native_qp_on_saved_instance():
    """The C++ solver handles the hard long-horizon car instance.

    The instance is COMMITTED (tests/goldens/qp_car_h100.npz: the first
    SQP subproblem of params_car_samples, ns=10, H=100 — nU=200, 400
    hard rows, 5010 soft rows with the 1e7 acados penalties, condensed
    row magnitudes spanning the full Gamma-growth range), replacing a
    dev-machine-only /tmp artifact that made this test permanently
    skip.  Also cross-checks the native solution against the stored
    jitted-PDIP solution of the identical instance."""
    import os
    from sampling_gpmpc_tpu.native import solve_qp_soft_native
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "goldens", "qp_car_h100.npz")
    d = np.load(path)
    u, gap, iters, status = solve_qp_soft_native(
        d["H"], d["g"], d["Gh"], d["dh"], d["Gs"], d["lo"], d["hi"],
        d["zl"], d["zu"], d["Zl"], d["Zu"])
    assert status == 0, (gap, iters)
    scale = max(1.0, float(np.abs(d["u_ref"]).max()))
    np.testing.assert_allclose(u, d["u_ref"], atol=1e-5 * scale)


def test_parallel_condense_matches_sequential():
    from sampling_gpmpc_tpu.ocp.condense import condense, condense_parallel
    rng = np.random.default_rng(11)
    ns, H, nx, nu = 3, 7, 4, 2
    A = jnp.asarray(rng.normal(size=(ns, H, nx, nx)) * 0.4)
    B = jnp.asarray(rng.normal(size=(ns, H, nx, nu)))
    r = jnp.asarray(rng.normal(size=(ns, H, nx)))
    dx0 = jnp.asarray(rng.normal(size=(ns, nx)))
    T1, G1 = condense(A, B, r, dx0)
    T2, G2 = condense_parallel(A, B, r, dx0)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(G1),
                               rtol=1e-10, atol=1e-12)
