"""Experiment configuration.

The reference drives every experiment from a single YAML file threaded around
as a raw nested dict (ref: main.py:33-36, SURVEY §5 "Config / flag system").
We keep the same file format so reference configs port 1:1, but parse them
once into a typed, hashable ``ProblemSpec`` holding every *static* quantity
(shapes, solver sizes, constraint layout) so that jitted functions can close
over it, plus a ``ProblemData`` pytree of numeric arrays (cost weights,
bounds, GP hyperparameters, tightenings).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import numpy as np
import yaml


def load_params(path: str) -> dict:
    """Load a reference-format YAML experiment file into a nested dict."""
    with open(path) as f:
        return yaml.safe_load(f)


def _tuple2(x) -> tuple:
    return tuple(np.asarray(x).reshape(-1).tolist())


@dataclasses.dataclass(frozen=True)
class GPHyper:
    """GP hyperparameters for the batched derivative GP.

    Mirrors the reference's per-output lengthscale/outputscale and the
    rank-0 multitask likelihood noise model (ref: src/GP_model.py:94-143):
    per-(point,task) observation noise = noise + task_noise[task]*multiplier.
    """

    lengthscale: Tuple[Tuple[float, ...], ...]  # (g_ny, D)
    outputscale: Tuple[float, ...]              # (g_ny,)
    noise: float
    task_noises: Tuple[float, ...]              # (Ty,) already multiplied
    beta: float
    jitter: float
    variance_is_zero: float
    min_data_dist: float

    @property
    def D(self) -> int:
        return len(self.lengthscale[0])


@dataclasses.dataclass(frozen=True)
class ProblemSpec:
    """Static problem description (hashable; safe as a jit static arg)."""

    env_name: str                 # params["env"]["dynamics"]
    nx: int
    nu: int
    g_ny: int
    g_nx: int
    g_nu: int
    ns: int                       # num_dyn_samples
    H: int
    dt: float
    Ty: int                       # observation tasks: 1 + g_nx + g_nu, or 1
    use_derivatives: bool         # False => value-only GP
    train_data_has_derivatives: bool
    g_idx_inputs: Tuple[int, ...]
    pad_g: Tuple[int, ...]
    # solver
    max_sqp_iter: int
    tol_nlp: float
    levenberg_marquardt: float
    num_mpc_iter: int
    shift_soln: bool
    # sampling switches
    true_dyn_as_sample: bool
    mean_as_dyn_sample: bool
    dynamics_rejection: bool
    # constraint layout
    use_tightening: bool
    use_feedback: bool
    input_generation: bool
    has_terminal_ellipse: bool
    n_ellipses: int
    cost_mean_only: bool          # params["optimizer"]["cost"] == "mean"
    # GP
    gp: GPHyper
    seed: int
    # QP exit tolerance override (<= 0: dtype default, 1e-8 f64 / 3e-5 f32).
    # Parity tests tighten this: the condensed 1e7-penalty curvature leaves
    # O(res/sigma_min) solution error along low-curvature input directions,
    # so a 1e-8 exit still moves dU by ~1e-4 vs an independent solver.
    qp_tol: float = -1.0

    @property
    def n_gp_inputs(self) -> int:
        return self.g_nx + self.g_nu


@dataclasses.dataclass
class ProblemData:
    """Numeric (non-static) problem data, set up once on the host."""

    start: np.ndarray           # (nx,)
    goal: np.ndarray            # (nx,)
    x_min: np.ndarray           # (nx,)
    x_max: np.ndarray
    u_min: np.ndarray           # (nu,)
    u_max: np.ndarray
    v_min: Optional[np.ndarray]  # feedback-mode bounds on the OCP input v
    v_max: Optional[np.ndarray]
    Qx: np.ndarray              # (nx, nx)
    Qu: np.ndarray              # (nu, nu)
    w_profile: np.ndarray       # (H+1,) per-stage scalar cost weight "cw"
    P_term: Optional[np.ndarray]   # (nx, nx) terminal ellipse metric
    K_fb: Optional[np.ndarray]     # (nu, nx) ancillary feedback gain
    delta_term: float
    tilde_eps: np.ndarray       # (H+1, nx+nu+1) per-stage tightenings
    ci: np.ndarray              # (H,) rejection tube radii
    ellipses: np.ndarray        # (n_ell, 5): x0, y0, a, b, f
    env_params: dict            # physical parameters (l, g, lf, lr, ...)


def _gp_hyper(params: dict) -> GPHyper:
    ag = params["agent"]
    g_ny = ag["g_dim"]["ny"]
    D = ag["g_dim"]["nx"] + ag["g_dim"]["nu"]
    ls = np.asarray(ag["Dyn_gp_lengthscale"]["both"], dtype=np.float64)
    ls = np.broadcast_to(ls.reshape(-1, D)[-g_ny:] if ls.size == g_ny * D
                         else ls.reshape(1, D), (g_ny, D))
    os_ = np.asarray(ag["Dyn_gp_outputscale"]["both"], dtype=np.float64).reshape(-1)
    os_ = np.broadcast_to(os_ if os_.size == g_ny else os_[:1], (g_ny,))
    use_deriv = not params["env"]["use_model_without_derivatives"]
    Ty = 1 + D if use_deriv else 1
    tn = np.asarray(ag["Dyn_gp_task_noises"]["val"], dtype=np.float64).reshape(-1)
    tn = tn[:Ty] * float(ag["Dyn_gp_task_noises"]["multiplier"])
    return GPHyper(
        lengthscale=tuple(map(_tuple2, ls)),
        outputscale=_tuple2(os_),
        noise=float(ag["Dyn_gp_noise"]),
        task_noises=_tuple2(tn),
        beta=float(ag["Dyn_gp_beta"]),
        jitter=float(ag["Dyn_gp_jitter"]),
        variance_is_zero=float(ag["Dyn_gp_variance_is_zero"]),
        min_data_dist=float(ag["Dyn_gp_min_data_dist"]),
    )


def make_spec(params: dict) -> ProblemSpec:
    ag, opt, env, common = (params["agent"], params["optimizer"],
                            params["env"], params["common"])
    # several published configs omit optional switches (e.g.
    # params_pendulum_samples has no tight/feedback blocks); default them off
    # like the benchmark drivers do
    ag.setdefault("tight", {"use": False, "dyn_eps": 0.0, "Lipschitz": 1.0,
                            "w_bound": 0.0})
    ag["tight"].setdefault("use", False)
    ag.setdefault("feedback", {"use": False})
    ag.setdefault("input_generation", False)
    ag.setdefault("shift_soln", True)
    ag.setdefault("mean_as_dyn_sample", False)
    ag.setdefault("true_dyn_as_sample", False)
    env.setdefault("use_model_without_derivatives", False)
    common.setdefault("dynamics_rejection", False)
    dyn = env["dynamics"]
    # each env module declares its GP index metadata (function-level import:
    # the env modules import this module for ProblemSpec)
    from sampling_gpmpc_tpu.envs import env_meta
    meta = env_meta(dyn)
    use_deriv = not env["use_model_without_derivatives"]
    g_nx, g_nu = ag["g_dim"]["nx"], ag["g_dim"]["nu"]
    tt = opt.get("terminal_tightening", None)
    return ProblemSpec(
        env_name=dyn,
        nx=ag["dim"]["nx"],
        nu=ag["dim"]["nu"],
        g_ny=ag["g_dim"]["ny"],
        g_nx=g_nx,
        g_nu=g_nu,
        ns=ag["num_dyn_samples"],
        H=opt["H"],
        dt=float(opt["dt"]),
        Ty=(1 + g_nx + g_nu) if use_deriv else 1,
        use_derivatives=use_deriv,
        train_data_has_derivatives=bool(env["train_data_has_derivatives"]),
        g_idx_inputs=meta["g_idx"],
        pad_g=meta["pad_g"],
        max_sqp_iter=opt["SEMPC"]["max_sqp_iter"],
        tol_nlp=float(opt["SEMPC"]["tol_nlp"]),
        levenberg_marquardt=float(opt["options"]["levenberg_marquardt"]),
        num_mpc_iter=common["num_MPC_itrs"],
        shift_soln=bool(ag["shift_soln"]),
        true_dyn_as_sample=bool(ag["true_dyn_as_sample"]),
        mean_as_dyn_sample=bool(ag["mean_as_dyn_sample"]),
        dynamics_rejection=bool(common["dynamics_rejection"]),
        use_tightening=bool(ag["tight"]["use"]),
        use_feedback=bool(ag["feedback"]["use"]),
        input_generation=bool(ag["input_generation"]),
        has_terminal_ellipse=(dyn == "Pendulum1D" and tt is not None),
        n_ellipses=len(env.get("ellipses", {}) or {}),
        cost_mean_only=(opt.get("cost", "expected") == "mean"),
        gp=_gp_hyper(params),
        seed=int(params["experiment"]["rnd_seed"]["value"])
        if params["experiment"]["rnd_seed"]["use"] else 0,
    )


def make_data(params: dict, spec: ProblemSpec) -> ProblemData:
    opt, env, ag = params["optimizer"], params["env"], params["agent"]
    H = spec.H
    tt = opt.get("terminal_tightening", None)
    P = np.asarray(tt["P"], dtype=np.float64) if tt and "P" in tt else None
    K = np.asarray(tt["K"], dtype=np.float64) if tt and "K" in tt else None
    delta = float(tt.get("delta", 0.0)) if tt else 0.0

    # per-stage scalar weight "cw" — the lane-change profile in
    # input-generation mode (ref: src/solver.py:41-49)
    if spec.input_generation:
        # lane-change profile 14/24/rest (ref: src/solver.py:41-47); clipped
        # for short horizons (the reference only solves this with H=50)
        len_a, len_b = 14, 24
        len_c = max(H + 1 - len_a - len_b, 0)
        w_profile = np.concatenate([
            1.95 * np.ones(len_a), 11.0 * np.ones(len_b),
            1.95 * np.ones(len_c)])[:H + 1]
    else:
        w_profile = np.ones(H + 1) * float(opt["w"])

    # tightenings (ref: src/utils/reachable_set.py:3-39); recomputed with
    # velocity profile by callers for the residual-car model
    if spec.use_tightening or (tt is not None and spec.env_name == "Pendulum1D"):
        from sampling_gpmpc_tpu.tightening import reachable_set_ball
        tilde_eps, ci = reachable_set_ball(params, np.ones(H + 1))
    else:
        tilde_eps = np.zeros((H + 1, spec.nx + spec.nu + 1))
        ci = np.zeros(H)

    ell = env.get("ellipses", {}) or {}
    ellipses = np.asarray([ell[k] for k in ell], dtype=np.float64).reshape(-1, 5)

    fb = ag["feedback"]
    return ProblemData(
        start=np.asarray(env["start"], dtype=np.float64),
        goal=np.asarray(env["goal_state"], dtype=np.float64),
        x_min=np.asarray(opt["x_min"], dtype=np.float64),
        x_max=np.asarray(opt["x_max"], dtype=np.float64),
        u_min=np.asarray(opt["u_min"], dtype=np.float64),
        u_max=np.asarray(opt["u_max"], dtype=np.float64),
        v_min=np.asarray(fb["v_min"], dtype=np.float64) if spec.use_feedback else None,
        v_max=np.asarray(fb["v_max"], dtype=np.float64) if spec.use_feedback else None,
        Qx=np.diag(np.asarray(opt["Qx"], dtype=np.float64)),
        Qu=np.diag(np.asarray(opt["Qu"], dtype=np.float64)),
        w_profile=w_profile,
        P_term=P,
        K_fb=K,
        delta_term=delta,
        tilde_eps=np.asarray(tilde_eps, dtype=np.float64),
        ci=np.asarray(ci, dtype=np.float64),
        ellipses=ellipses,
        env_params=dict(env.get("params", {}) or {}),
    )


def load_problem(path: str) -> Tuple[dict, ProblemSpec, ProblemData]:
    params = load_params(path)
    spec = make_spec(params)
    data = make_data(params, spec)
    return params, spec, data
