"""Benchmark: SQP solves/s on the BASELINE.md workload (H=20 horizon).

Runs the full jitted SQP-RTI solve (GP conditioning + function sampling +
linearization + condensing + PDIP QP) for a pendulum1D sampling workload
with ns=64 dynamics samples at H=20, on the default accelerator, and
compares against the same computation on host CPU (stand-in for the
reference's CPU acados+GPyTorch path — the repo publishes no numbers,
BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("SGPMPC_DTYPE", "float32")


def _run_worker(env_extra: dict, timeout_s: float):
    """Run this script as a watchdogged child; return its JSON line or None.

    The axon TPU relay can hang uninterruptibly at ANY stage (backend
    init, compile, or the first transfer) when the tunnel flaps; jax
    cannot be aborted from Python once blocked.  So the parent process
    never imports jax: the whole bench runs in a killable child, and a
    hung child is abandoned (it may survive SIGKILL in D-state until its
    syscall returns — do not wait to reap it).
    """
    import tempfile
    env = dict(os.environ, SGPMPC_BENCH_WORKER="1", **env_extra)
    with tempfile.TemporaryFile(mode="w+") as out:
        try:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                stdout=out, stderr=sys.stderr, env=env)
        except OSError:
            return None
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            return None
        if rc != 0:
            return None
        out.seek(0)
        for line in out.read().splitlines():
            if line.startswith("{"):
                return line
    return None


if __name__ == "__main__" and os.environ.get("SGPMPC_BENCH_PROBE") == "1":
    # device probe child: exits 0 iff the default backend initializes
    import jax
    jax.devices()
    print("{}")
    sys.exit(0)


if __name__ == "__main__" and os.environ.get("SGPMPC_BENCH_WORKER") != "1":
    # orchestrate only when run as a script: importers (e.g.
    # profiling/stage_breakdown.py) need the module's functions, not a
    # bench run followed by sys.exit
    # orchestrator: cheap backend probe -> accelerator attempt -> host-CPU
    # fallback -> failure record; the driver contract is ONE JSON line,
    # never a hang.  The probe catches the common failure mode (relay down
    # at backend init) in ~90 s instead of burning the full accelerator
    # budget before falling back.
    probe = _run_worker({"SGPMPC_BENCH_PROBE": "1"}, 90.0)
    line = None
    if probe is None:
        print("# accelerator backend init hung; host-CPU fallback",
              file=sys.stderr, flush=True)
    else:
        line = _run_worker({}, float(os.environ.get("SGPMPC_BENCH_TIMEOUT",
                                                    "2700")))
    if line is None:
        print("# accelerator bench hung or failed; host-CPU fallback",
              file=sys.stderr, flush=True)
        line = _run_worker({"JAX_PLATFORMS": "cpu",
                            "PALLAS_AXON_POOL_IPS": ""}, 900.0)
    if line is None:
        line = json.dumps({
            "metric": "sqp_solves_per_s", "value": 0.0,
            "unit": "BENCH FAILED: accelerator and host-CPU runs both "
                    "hung or crashed", "vs_baseline": 0.0})
    print(line, flush=True)
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np


def build(spec_overrides=None):
    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.envs import make_env

    here = os.path.dirname(os.path.abspath(__file__))
    params, spec, data = load_problem(
        os.path.join(here, "params", "params_pendulum1D_samples.yaml"))
    over = dict(ns=64, H=20, max_sqp_iter=1, num_mpc_iter=1)
    over.update(spec_overrides or {})
    spec = dataclasses.replace(spec, **over)
    params["agent"]["num_dyn_samples"] = spec.ns
    params["optimizer"]["H"] = spec.H
    # re-derive H-dependent data (tightenings, w profile)
    from sampling_gpmpc_tpu.config import make_data
    data = make_data(params, spec)
    env = make_env(spec, params)
    return params, spec, data, env


def setup_solve(spec, data, env, device, dtype):
    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.ocp import sqp
    from sampling_gpmpc_tpu.ocp.spec import make_ocp_data

    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec, dtype)[0]
    st = jnp.asarray(data.start, dtype)

    args = jax.device_put((st, X, U, gp, eps), device)
    ocp, hyp = jax.device_put((ocp, hyp), device)

    jfn = jax.jit(lambda st, X, U, gp, eps: sqp.solve(
        spec, env, hyp, ocp, st, X, U, gp, eps))

    def fn(*a):
        # enter default_device so trace-time platform gates (e.g. the
        # fused Pallas IPM's fused_ok) see the device this run targets,
        # not the process-default TPU relay
        with jax.default_device(device):
            return jfn(*a)

    return fn, args


def setup_closed_loop(spec, data, env, device, dtype):
    """Jitted closed-loop MPC step: solve (QP warm-started) -> apply u0 to
    the plant -> shift the solution.  This is the workload the reference
    times (`solver_time` inside the receding-horizon loop with acados QP
    warm starts and solution shifting, ref: src/DEMPC.py:93-97,
    src/utils/ocp.py:310, src/solver.py:174-189) — every solve after the
    first is warm, exactly like deployment."""
    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.dempc import shift_solution
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.ocp import sqp
    from sampling_gpmpc_tpu.ocp.spec import make_ocp_data

    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec,
                                   dtype)
    x0 = jnp.asarray(data.start, dtype)
    ws = sqp.init_qp_ws(spec, dtype)
    K_fb = (jnp.asarray(data.K_fb, dtype) if spec.use_feedback else None)
    goal = jnp.asarray(data.goal, dtype)

    # donate the carry buffers (iterate, GP buffers, warm-start state):
    # in-place device updates instead of per-step re-allocation
    donate = (0, 1, 2, 3, 4) if device.platform != "cpu" else ()
    jstep = jax.jit(lambda x, X, U, gp, ws, wv, eps: _mpc_step(
        spec, env, hyp, ocp, x, X, U, gp, ws, wv, eps, K_fb, goal,
        shift_solution), donate_argnums=donate)

    def step(carry, eps_m):
        with jax.default_device(device):
            return jstep(*carry, eps_m)

    carry0 = jax.device_put(
        (x0, X, U, gp, ws, jnp.asarray(False)), device)
    eps = jax.device_put(eps, device)
    return step, carry0, eps


def _mpc_step(spec, env, hyp, ocp, x, X, U, gp, ws, wv, eps, K_fb, goal,
              shift_solution):
    from sampling_gpmpc_tpu.ocp import sqp

    st = sqp.solve(spec, env, hyp, ocp, x, X, U, gp, eps,
                   qp_ws=ws, qp_valid=wv)
    X, U = st.X, st.U
    u0 = U[0]
    if K_fb is not None:
        u0 = u0 - (goal - X[0, 0]) @ K_fb.T
    x_next = env.discrete_dyn(X[0, 0], u0).reshape(-1)
    if spec.shift_soln:
        X, U = shift_solution(spec, X, U)
    return x_next, X, U, st.gp, st.qp_ws, st.qp_valid


def time_closed_loop(step, carry0, eps, n_warmup=3, n_iter=20):
    """Chained per-step dispatch timing (diagnostic only: through the axon
    relay this measures host dispatch rate as much as device time — see
    setup_closed_loop_scan, which the headline metric uses instead)."""
    carry = carry0
    for m in range(n_warmup):
        carry = step(carry, eps[m % eps.shape[0]])
    carry[0].block_until_ready()
    t0 = time.perf_counter()
    for m in range(n_iter):
        carry = step(carry, eps[(n_warmup + m) % eps.shape[0]])
    carry[0].block_until_ready()
    return (time.perf_counter() - t0) / n_iter


def setup_closed_loop_scan(spec, data, env, device, dtype):
    """Closed-loop window as ONE jitted ``lax.scan`` (single dispatch).

    Timing the loop as chained per-step dispatches charges the axon
    relay's host->device dispatch rate (~1 ms/call, load-dependent) to
    every step — measured as a 2x run-to-run spread on the same device
    computation (196/273/368 solves/s across round-3 runs) while the
    single-dispatch fs metric held +-1 %.  The plant step is simulated
    on-device either way, so folding the whole window into one scan is
    the same computation minus the relay artifact: what local (non-
    tunneled) hardware would measure.
    """
    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.dempc import shift_solution
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.ocp import sqp
    from sampling_gpmpc_tpu.ocp.spec import make_ocp_data

    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec,
                                   dtype)
    x0 = jnp.asarray(data.start, dtype)
    ws = sqp.init_qp_ws(spec, dtype)
    K_fb = (jnp.asarray(data.K_fb, dtype) if spec.use_feedback else None)
    goal = jnp.asarray(data.goal, dtype)

    def loop(carry, eps_seq):
        # fori_loop, NOT lax.scan: wrapping the Pallas stages in a scan
        # triggers a pathological one-time ~140 s XLA compile (measured;
        # the identical body under while/fori compiles in ~10 s)
        n = eps_seq.shape[0]

        def body(k, c):
            eps_m = jax.lax.dynamic_index_in_dim(eps_seq, k,
                                                 keepdims=False)
            return _mpc_step(spec, env, hyp, ocp, *c, eps_m, K_fb, goal,
                             shift_solution)

        out = jax.lax.fori_loop(0, n, body, carry)
        return out, out[0]

    jloop = jax.jit(loop)

    def run(carry, eps_seq):
        with jax.default_device(device):
            return jloop(carry, eps_seq)

    carry0 = jax.device_put(
        (x0, X, U, gp, ws, jnp.asarray(False)), device)
    eps = jax.device_put(eps, device)
    return run, carry0, eps


def time_closed_loop_scan(run, carry0, eps, n_warmup=3, n_iter=20,
                          reps=3):
    """Steady-state MPC step rate, relay-proof: ONE dispatch per timing
    window.  The warmup transient reuses the SAME n_iter-step window
    shape as the timed windows so the whole bench compiles exactly one
    scan (compiles dominate the budget with the fused Pallas stages).
    Times ``reps`` windows from the warm carry and keeps the fastest
    (identical computations; min rejects residual host noise).

    NOTE: the result still contains dispatch_overhead/n_iter per step
    (~26 ms/call through the relay for this carry size) — use
    :func:`time_closed_loop_slope` for the device-true marginal rate."""
    carry = carry0
    for s in range(0, max(n_warmup, 1), n_iter):
        w = eps[s:s + n_iter]
        if w.shape[0] < n_iter:     # pad by cycling from the start
            w = jnp.concatenate([w, eps[:n_iter - w.shape[0]]])
        carry, _ = run(carry, w)
    jax.block_until_ready(carry[0])
    window = eps[n_warmup:n_warmup + n_iter]
    if window.shape[0] < n_iter:
        window = jnp.concatenate([window, eps[:n_iter - window.shape[0]]])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out, xs = run(carry, window)
        jax.block_until_ready(xs)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


class SlopeUnstableError(RuntimeError):
    """No positive, repeatable slope could be measured (noise-dominated
    windows).  Callers must mark the row invalid — never print a clamped
    stand-in value (VERDICT r4 weak #2: the old 1e-9 clamp silently
    turned a non-positive slope into a 1e9 'solves/s' row)."""


def time_closed_loop_slope(run, carry0, eps, n_warmup=3, n_small=20,
                           n_large=100, reps=3, max_tries=4,
                           pick_min=False):
    """Device-true per-step time as the SLOPE between two window lengths.

    One jitted-window dispatch costs a CONSTANT ~26 ms in relay arg/result
    marshaling for this carry size, independent of window length (measured
    on stubbed 10/20/40/80-step windows).  Timing windows of ``n_small``
    and ``n_large`` steps from the SAME warm carry (the small window is a
    strict prefix of the large one) and differencing cancels that constant
    exactly: the slope is the marginal cost of an MPC step — what local
    (non-tunneled) hardware pays.  Returns ``(dt_step, dispatch_s)``:
    marginal seconds/step and the estimated per-dispatch constant.

    Noise guards (VERDICT r4 #2): a two-window measurement is accepted
    only when ``t_large > t_small``; the measurement is repeated until
    two consecutive slopes agree within 20 % (their mean is returned).
    If no two agree within ``max_tries`` attempts the median of the
    positive slopes is returned with a stderr note; if NO positive slope
    was seen at all, :class:`SlopeUnstableError` is raised instead of
    fabricating a number.

    ``pick_min``: measure all ``max_tries`` pairs and return the MINIMUM
    positive slope — the least-contended estimate.  Used for the
    in-process CPU baselines, whose thread-scheduling noise otherwise
    moves the mean-of-two-agreeing by tens of percent across runs
    (measured: dt_cpu 8.6 vs 12.4 ms/step on an idle box run-to-run,
    a 43 % swing in vs_baseline); min-of-4 is stable and CONSERVATIVE
    for every speedup ratio.
    """
    carry = carry0
    for s in range(0, max(n_warmup, 1), n_large):
        w = eps[s:s + n_large]
        if w.shape[0] < n_large:
            w = jnp.concatenate([w, eps[:n_large - w.shape[0]]])
        carry, _ = run(carry, w)
    jax.block_until_ready(carry[0])

    def window(n):
        w = eps[n_warmup:n_warmup + n]
        if w.shape[0] < n:
            w = jnp.concatenate([w, eps[:n - w.shape[0]]])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out, xs = run(carry, w)
            jax.block_until_ready(xs)
            best = min(best, time.perf_counter() - t0)
        return best

    slopes = []
    for _ in range(max_tries):
        t_small, t_large = window(n_small), window(n_large)
        if t_large <= t_small:
            continue
        dt = (t_large - t_small) / (n_large - n_small)
        slopes.append((dt, max(t_small - n_small * dt, 0.0)))
        if not pick_min and len(slopes) >= 2:
            a, b = slopes[-2][0], slopes[-1][0]
            if abs(a - b) <= 0.2 * max(a, b):
                return ((a + b) / 2.0,
                        (slopes[-2][1] + slopes[-1][1]) / 2.0)
    if pick_min and slopes:
        return min(slopes)
    if not slopes:
        raise SlopeUnstableError(
            f"no positive slope in {max_tries} tries "
            f"(windows {n_small}/{n_large}, reps {reps})")
    slopes.sort()
    dt, dispatch = slopes[len(slopes) // 2]
    print(f"# slope noisy: {len(slopes)} positive measurements did not "
          f"pairwise agree within 20%; reporting the median "
          f"{dt * 1e3:.3f} ms/step", file=sys.stderr, flush=True)
    return dt, dispatch


def time_solve(fn, args, n_warmup=2, n_iter=20):
    """Pipelined throughput timing: dispatch all solves, block once.

    Per-call blocking would charge the host<->device round trip (large
    through the axon relay tunnel, absent on local hardware) to every
    solve; successive solves serialize on the device stream anyway.
    """
    for _ in range(n_warmup):
        out = fn(*args)
        out.X.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    out.X.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    return dt


def build_car(spec_overrides=None):
    """The multi-SQP-iteration car workload (VERDICT r4 #3): ns=20, H=15,
    max_sqp_iter=4 per MPC step (ref: params/params_car.yaml optimizer) —
    iterations >= 1 run the hallucination-block GP path, the op-chain the
    empty-hall Pallas fusion does NOT cover."""
    from sampling_gpmpc_tpu.config import load_problem, make_data
    from sampling_gpmpc_tpu.envs import make_env

    here = os.path.dirname(os.path.abspath(__file__))
    params, spec, data = load_problem(
        os.path.join(here, "params", "params_car.yaml"))
    over = dict(num_mpc_iter=103)
    over.update(spec_overrides or {})
    spec = dataclasses.replace(spec, **over)
    params["agent"]["num_dyn_samples"] = spec.ns
    params["optimizer"]["H"] = spec.H
    data = make_data(params, spec)
    env = make_env(spec, params)
    return params, spec, data, env


def fused_equiv_check(spec, data, env, dev, dtype):
    """On-chip fused-vs-XLA equivalence (VERDICT r4 #4).

    The suite's Pallas tests run the kernels in interpret mode (CPU), so
    Mosaic lowering bugs would pass the suite and ship.  Here the SAME
    full SQP solve runs three times on the real device — (a) fused GP +
    fused IPM, (b) XLA GP + fused IPM, (c) all-XLA — and the control/
    state outputs are differenced to attribute any disagreement to the
    fused GP stage ((a) vs (b)) or the fused IPM ((b) vs (c)).  The gates
    read SGPMPC_NO_FUSED_* at trace time, so toggling the env between
    fresh jits selects the path.
    Returns {"gp": maxdiff, "ipm": maxdiff} in units of the solution.
    """
    import numpy as np

    def solve_once(no_gp, no_ipm):
        saved = {k: os.environ.pop(k, None)
                 for k in ("SGPMPC_NO_FUSED_GP", "SGPMPC_NO_FUSED_IPM")}
        try:
            if no_gp:
                os.environ["SGPMPC_NO_FUSED_GP"] = "1"
            if no_ipm:
                os.environ["SGPMPC_NO_FUSED_IPM"] = "1"
            fn, args = setup_solve(spec, data, env, dev, dtype)
            out = fn(*args)
            return (np.asarray(out.X), np.asarray(out.U))
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None)
                if v is not None:
                    os.environ[k] = v

    X_a, U_a = solve_once(False, False)
    X_b, U_b = solve_once(True, False)
    X_c, U_c = solve_once(True, True)
    d = lambda p, q: float(np.max(np.abs(p - q)))
    return {"gp": max(d(X_a, X_b), d(U_a, U_b)),
            "ipm": max(d(X_b, X_c), d(U_b, U_c))}


def fused_hall_equiv_check(dev, dtype):
    """On-chip fused-vs-XLA check for the HALL-BLOCK GP kernel.

    Compares the iteration-1 GP function-samples of the car workload at
    IDENTICAL inputs (warm iterate from a full XLA 2-iter solve; hall
    buffer filled by a real iteration-0 append) between the fused
    Pallas path and the XLA twin, against the TUBE criterion: every
    fused sample must lie within the twin's mu +/- beta*(sigma +
    sigma_noise), where sigma_noise = sqrt(NOISE_REL * prior_var) is
    the f32 posterior-variance cancellation floor.  Raw max |dg diff|
    is reported too, but it is NOT a defect metric: at near-
    deterministic points both paths compute variance at the same
    ~1e-4*prior noise floor with different roundoff, so one path floors
    a sample to the mean while the other keeps a beta*sigma_noise
    deviation (measured 2.3e-2 on the car shapes) — the same f32 class
    the suite's tube tests pin (tests/test_f32_envelope.py).
    Returns {"dg": raw maxdiff, "viol": tube violation (0 = pass)}.
    """
    import numpy as np

    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.gp import exact
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.ocp import sqp
    from sampling_gpmpc_tpu.ocp.spec import make_ocp_data

    NOISE_REL = 1e-3
    _, spec, data, env = build_car({"max_sqp_iter": 2})
    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec,
                                   dtype)
    st = jnp.asarray(data.start, dtype)

    saved = os.environ.pop("SGPMPC_NO_FUSED_GP", None)
    try:
        os.environ["SGPMPC_NO_FUSED_GP"] = "1"
        with jax.default_device(dev):
            warm = jax.jit(lambda X, U, gp: sqp.solve(
                spec, env, hyp, ocp, st, X, U, gp, eps[0]))(X, U, gp)
            X1, U1 = warm.X, warm.U
            xu = sqp._linearization_inputs(spec, ocp, X1, U1)
            Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
            _, gp_f = jax.jit(lambda gp: agent_mod.sample_dynamics(
                spec, env, hyp, gp, Xt, eps[1][0], hall_empty=True))(
                agent_mod.reset_hall(gp))
            Xt1 = Xt + 0.01 * jax.random.normal(jax.random.PRNGKey(5),
                                                Xt.shape, dtype)
            dg_x = np.asarray(jax.jit(
                lambda gp: agent_mod.sample_dynamics(
                    spec, env, hyp, gp, Xt1, eps[1][1],
                    hall_empty=False))(gp_f)[0])
            mean, cov = jax.jit(
                lambda gp: agent_mod._batched_posterior_incremental(
                    spec, hyp, gp, Xt1))(gp_f)
        os.environ.pop("SGPMPC_NO_FUSED_GP", None)
        with jax.default_device(dev):
            dg_p = np.asarray(jax.jit(
                lambda gp: agent_mod.sample_dynamics(
                    spec, env, hyp, gp, Xt1, eps[1][1],
                    hall_empty=False))(gp_f)[0])
    finally:
        os.environ.pop("SGPMPC_NO_FUSED_GP", None)
        if saved is not None:
            os.environ["SGPMPC_NO_FUSED_GP"] = saved

    shape = (spec.ns, spec.g_ny, spec.H, spec.Ty)
    mu = np.asarray(mean).reshape(shape)
    var = np.clip(np.asarray(jnp.diagonal(cov, axis1=-2, axis2=-1)),
                  0, None).reshape(shape)
    pv = np.stack([np.asarray(exact.prior_task_variances(
        hyp.lengthscale[j], hyp.outputscale[j], spec.Ty))
        for j in range(spec.g_ny)])                    # (g_ny, Ty)
    sigma_n = np.sqrt(NOISE_REL * pv)[None, :, None, :]
    bound = spec.gp.beta * (np.sqrt(var) + sigma_n)
    viol = np.maximum(np.abs(dg_p - mu) - bound, 0.0)
    return {"dg": float(np.abs(dg_p - dg_x).max()),
            "viol": float(viol.max())}


def setup_fs_rollout(device, dtype, ns=4000, steps=50):
    """Second BASELINE metric: GP-sample rollouts/s/chip on the
    forward-sampling reachability workload (ns GP function realizations,
    per-step iterative conditioning, replaying a fixed input plan; ref:
    benchmarking/simulate_forward_sampling_car.py:117-137)."""
    import dataclasses as dc

    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.reachability import forward_sample_rollout

    here = os.path.dirname(os.path.abspath(__file__))
    params, spec, data = load_problem(
        os.path.join(here, "params", "params_car_residual_fs.yaml"))
    spec = dc.replace(spec, ns=ns)
    params["agent"]["num_dyn_samples"] = ns
    env = make_env(spec, params)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp0 = agent_mod.init_gp_state(spec, env, dtype, capacity=steps)
    x0 = jnp.asarray(data.start, dtype)
    U = jnp.zeros((steps, spec.nu), dtype)
    fb = None
    if spec.use_feedback and data.K_fb is not None:
        fb = {"K": data.K_fb, "x_eq": data.goal}
    gp0, U = jax.device_put((gp0, U), device)

    jfn = jax.jit(lambda gp, key: forward_sample_rollout(
        spec, env, hyp, gp, x0, U, key, use_feedback=fb)[0])

    def fn(gp, key):
        with jax.default_device(device):
            return jfn(gp, key)

    return fn, gp0, (params, spec, data), ns * steps


def time_fs(fn, gp0, n_warmup=1, n_iter=3):
    """Fastest single rollout of n_iter (each one dispatch, blocked):
    the relay stream can stall mid-run for seconds (measured: a 4x
    fs collapse in one bench run of an otherwise-stable triple), and
    the minimum needs only ONE clean rollout.  Per-rollout blocking
    charges one ~26 ms dispatch to a ~1.3 s computation (~2%)."""
    for r in range(n_warmup):
        X = fn(gp0, jax.random.PRNGKey(r))
        X.block_until_ready()
    best = float("inf")
    for r in range(n_iter):
        t0 = time.perf_counter()
        X = fn(gp0, jax.random.PRNGKey(100 + r))
        X.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    nan_frac = float(jnp.isnan(X).mean())
    return best, nan_frac


def torch_fs_baseline_steps_per_s(psd, ns=200, steps=30):
    """Reference-shaped torch f64 CPU baseline (per-step full GP refit,
    batched over (ns, g_ny) like GPyTorch's batch GP) at a reduced shape.

    CONSERVATIVE: at the full (ns=4000, 50-step) shape the torch pipeline
    is memory-bound (the batched train covariance alone is ~700 MB) and
    measures ~1.6k steps/s (BENCH_NOTES / benchmarking/torch_fs_baseline.py);
    at this cache-resident reduced shape it runs several times faster per
    sampled step, so the reported fs_vs_baseline UNDERSTATES the speedup."""
    import dataclasses as dc

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarking"))
    import torch_fs_baseline

    params, spec, data = psd
    spec = dc.replace(spec, ns=ns)
    import numpy as np
    U = np.zeros((steps, spec.nu))
    # Stability (the three-runs-within-20% bar): a single in-process
    # torch measurement moved ~35 % across idle-box bench runs, and
    # best-of-3 still moved ~30 % — the variance tracks the thread
    # count torch inherits from whatever XLA-CPU work ran earlier in
    # the process.  Pin the thread count, then take the fastest of 5
    # repeats (conservative for the speedup).
    import torch
    torch.set_num_threads(min(8, os.cpu_count() or 8))
    best = 0.0
    for r in range(5):
        out = torch_fs_baseline.run(params, spec, data, ns, steps, U,
                                    seed=0)
        best = max(best, out["steps_per_s"])
    return best


def main():
    dtype = jnp.float32
    # 100-step timing window: ONE relay dispatch costs ~26 ms in arg/result
    # marshaling for this carry size REGARDLESS of window length (measured:
    # stubbed-solve windows of 10/20/40/80 steps all cost ~26-31 ms), so
    # short windows charge the relay artifact to every step — n_iter=20
    # read ~1.5 ms/step where the device-true steady-state step is ~0.3 ms
    n_warmup, n_iter = 3, 100
    params, spec, data, env = build({"num_mpc_iter": n_warmup + n_iter})
    profile_dir = os.environ.get("SGPMPC_PROFILE")

    dev = jax.devices()[0]
    run, carry0, eps = setup_closed_loop_scan(spec, data, env, dev, dtype)
    notes = []
    try:
        dt_dev, dispatch_s = time_closed_loop_slope(
            run, carry0, eps, n_warmup, n_small=20, n_large=n_iter)
    except SlopeUnstableError as e:
        # conservative fallback: the dispatch-INCLUSIVE window rate (a
        # strict lower bound on the device rate) — never a fabricated
        # slope (VERDICT r4 #2)
        notes.append(f"headline slope unmeasurable ({e}); reported the "
                     "dispatch-inclusive window rate, a lower bound")
        dt_dev = time_closed_loop_scan(run, carry0, eps, n_warmup, n_iter)
        dispatch_s = 0.0
    if profile_dir:
        # one traced window for jax.profiler / xprof (SURVEY §5 tracing)
        with jax.profiler.trace(profile_dir):
            time_closed_loop_scan(run, carry0, eps, n_warmup, n_iter=5,
                                  reps=1)
        print(f"# trace written to {profile_dir}", file=sys.stderr)
    solves_per_s = 1.0 / dt_dev

    # Contention accounting (VERDICT r4 #2): the CPU baselines run
    # in-process, so external load slows THEM while the (exclusive)
    # accelerator is unaffected — a loaded box inflates every
    # *_vs_baseline ratio.  Ratios are ANNULLED (reported as 0.0 with an
    # explicit note) when the 1-min load average exceeds half the core
    # count; the device-rate rows stay valid either way.
    try:
        load_avg = round(os.getloadavg()[0], 2)
    except OSError:
        load_avg = -1.0
    load_limit = max(4.0, 0.5 * (os.cpu_count() or 8))
    contended = load_avg > load_limit
    if contended:
        notes.append(
            f"load_avg {load_avg} > {load_limit:.0f}: in-process CPU "
            "baselines unreliable; all *_vs_baseline ratios annulled (0.0)")

    # host-CPU baseline of the identical computation, SAME 20/100 window
    # structure as the device measurement (VERDICT r4 #6: the previous
    # 1/4-step CPU windows measured a different warm regime), fastest of
    # 2 repeats.
    vs_baseline = 1.0
    if dev.platform != "cpu" and not contended:
        try:
            cpu = jax.devices("cpu")[0]
            run_c, carry_c, eps_c = setup_closed_loop_scan(
                spec, data, env, cpu, dtype)
            dt_cpu, _ = time_closed_loop_slope(
                run_c, carry_c, eps_c, n_warmup, n_small=20,
                n_large=n_iter, reps=2, pick_min=True)
            vs_baseline = dt_cpu / dt_dev
        except Exception as e:  # noqa: BLE001
            print(f"# cpu baseline failed: {e}", file=sys.stderr)
            vs_baseline = 0.0
            notes.append(f"cpu baseline failed ({e}); vs_baseline 0.0")
    elif contended:
        vs_baseline = 0.0

    # large-ns headline row (VERDICT r3 #6): the method's published scale
    # is ns=500-4000 (params_pendulum_samples ns=500, fs ns=4000); report
    # the same warm closed-loop metric at ns=512 where per-sample cost
    # amortizes the dispatch floor.  20/80-step windows: the previous
    # 5/20-step windows sat inside the slope method's own noise floor
    # (214 vs 787 solves/s across runs, VERDICT r4 #2); at ~1.3-5 ms/step
    # the 60-step difference is 80-300 ms >> timer noise.
    ns512 = {"v": 0.0, "vs": 0.0}
    if dev.platform != "cpu" and not os.environ.get("SGPMPC_BENCH_SKIP_512"):
        try:
            _, spec5, data5, env5 = build(
                {"ns": 512, "num_mpc_iter": n_warmup + 80})
            run5, c5, e5 = setup_closed_loop_scan(spec5, data5, env5, dev,
                                                  dtype)
            dt5, _ = time_closed_loop_slope(run5, c5, e5, n_warmup,
                                            n_small=20, n_large=80, reps=3)
            ns512["v"] = 1.0 / dt5
            if not contended:
                run5c, c5c, e5c = setup_closed_loop_scan(
                    spec5, data5, env5, jax.devices("cpu")[0], dtype)
                dt5c, _ = time_closed_loop_slope(
                    run5c, c5c, e5c, n_warmup, n_small=20, n_large=40,
                    reps=2, pick_min=True)
                ns512["vs"] = dt5c / dt5
        except SlopeUnstableError as e:
            notes.append(f"ns=512 slope unmeasurable ({e}); row 0.0")
        except Exception as e:  # noqa: BLE001
            print(f"# ns=512 bench failed: {e}", file=sys.stderr)

    # multi-SQP-iteration car closed loop (VERDICT r4 #3): ns=20, H=15,
    # 4 SQP iterations per MPC step — iterations >= 1 exercise the
    # hallucination-block GP path on the chip
    car = {"v": 0.0, "vs": 0.0}
    if dev.platform != "cpu" and not os.environ.get("SGPMPC_BENCH_SKIP_CAR"):
        try:
            _, specc, datac, envc = build_car()
            runc, cc, ec = setup_closed_loop_scan(specc, datac, envc, dev,
                                                  dtype)
            dtc, _ = time_closed_loop_slope(runc, cc, ec, n_warmup,
                                            n_small=20, n_large=80, reps=3)
            car["v"] = 1.0 / dtc
            if not contended:
                runcc, ccc, ecc = setup_closed_loop_scan(
                    specc, datac, envc, jax.devices("cpu")[0], dtype)
                # short windows: the car CPU step is ~0.4 s, so the
                # 20/40 windows alone cost ~4 min; 10/20 keeps the
                # measurement above timer noise (2 s delta) at 1/4 cost
                dtcc, _ = time_closed_loop_slope(
                    runcc, ccc, ecc, n_warmup, n_small=10, n_large=20,
                    reps=2, max_tries=2, pick_min=True)
                car["vs"] = dtcc / dtc
        except SlopeUnstableError as e:
            notes.append(f"car slope unmeasurable ({e}); row 0.0")
        except Exception as e:  # noqa: BLE001
            print(f"# car bench failed: {e}", file=sys.stderr)

    # on-chip fused-vs-XLA equivalence (VERDICT r4 #4); skipped off-TPU
    # (the fused paths are TPU-gated, the diffs would be trivially 0)
    equiv = {"gp": -1.0, "ipm": -1.0, "hall": -1.0, "hall_viol": -1.0}
    if dev.platform != "cpu" and not os.environ.get("SGPMPC_BENCH_SKIP_EQUIV"):
        try:
            equiv.update(fused_equiv_check(spec, data, env, dev, dtype))
        except Exception as e:  # noqa: BLE001
            print(f"# fused equivalence check failed: {e}", file=sys.stderr)
            notes.append(f"fused equivalence check failed: {e}")
        try:
            h = fused_hall_equiv_check(dev, dtype)
            equiv["hall"] = h["dg"]
            equiv["hall_viol"] = h["viol"]
            if h["viol"] > 0.0:
                notes.append(
                    f"fused hall kernel exceeded the noise-floor tube by "
                    f"{h['viol']:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"# fused hall equivalence check failed: {e}",
                  file=sys.stderr)
            notes.append(f"fused hall equivalence check failed: {e}")

    # second BASELINE metric: GP-sample rollouts/s/chip (fs reachability)
    fs_steps_per_s = 0.0
    fs_vs_ref = 0.0
    fs_nan_frac = -1.0
    try:
        fs_fn, gp0, psd, work = setup_fs_rollout(dev, dtype)
        dt_fs, fs_nan_frac = time_fs(fs_fn, gp0)
        fs_steps_per_s = work / dt_fs
        try:
            fs_vs_ref = fs_steps_per_s / torch_fs_baseline_steps_per_s(psd)
        except Exception as e:  # noqa: BLE001
            print(f"# torch fs baseline failed: {e}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# fs rollout bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "sqp_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s (ns=64, H=20, warm closed-loop GP-sampling "
                "SQP-RTI steps: solve + plant step + shift; marginal "
                "per-step rate = slope between a 20- and a 100-step "
                "jitted closed-loop window, which cancels the constant "
                "~26 ms/dispatch relay marshaling overhead exactly); "
                "cpu baseline = same slope of the identical jitted "
                "computation, fastest of 3 repeats",
        "vs_baseline": round(vs_baseline, 3),
        "dispatch_ms_per_call": round(dispatch_s * 1e3, 2),
        "load_avg_1min": load_avg,
        "ns512_value": round(ns512["v"], 3),
        "ns512_vs_baseline": round(ns512["vs"], 3),
        "ns512_unit": "solves/s, same warm closed-loop metric at ns=512 "
                      "(the method's published sample scale)",
        "car_value": round(car["v"], 3),
        "car_vs_baseline": round(car["vs"], 3),
        "car_unit": "solves/s, params_car closed loop (ns=20, H=15, 4 SQP "
                    "iters/step: iterations >= 1 run the hallucination-"
                    "block GP path)",
        "fused_gp_vs_xla_maxdiff": round(equiv["gp"], 8),
        "fused_ipm_vs_xla_maxdiff": round(equiv["ipm"], 8),
        "fused_hall_gp_vs_xla_maxdiff": round(equiv["hall"], 8),
        "fused_hall_tube_violation": round(equiv["hall_viol"], 8),
        "equiv_unit": "on-chip max |solution diff| of the SAME solve with "
                      "the fused Pallas stage swapped for its XLA twin "
                      "(-1.0 = not run)",
        "notes": notes,
        "fs_metric": "gp_sample_rollout_steps_per_s",
        "fs_value": round(fs_steps_per_s, 1),
        "fs_unit": "sampled steps/s (ns=4000 GP realizations x 50 steps, "
                   "per-step iterative conditioning, f32; vs reference-"
                   "shaped torch f64 CPU per-step-refit baseline)",
        "fs_vs_baseline": round(fs_vs_ref, 3),
        "fs_nan_frac": fs_nan_frac,
    }))


if __name__ == "__main__":
    main()
