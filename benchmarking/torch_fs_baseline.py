"""Reference-shaped torch CPU baseline for forward-sampling reachability.

The reference runs this workload on torch/GPyTorch: EVERY rollout step
rebuilds the exact GP on real + hallucinated-so-far data and refactorizes
the full kernel matrix (`agent.train_hallucinated_dynGP` called per step,
ref: benchmarking/simulate_forward_sampling_car.py:117-137), in float64
(ref: src/agent.py:15).  This script reproduces that exact pipeline shape
in raw torch f64 on the host CPU — per-step FULL refit, batched kernel
algebra over (ns, g_ny), value-only GP, mu±beta*sigma clipping, iterative
conditioning, ancillary feedback — so `bench`-style vs-CPU claims can be
made against a baseline with the REFERENCE's cost profile (O(t^3) per
step) and framework (torch), not against our own JAX code re-run on CPU.

It also serves as a cross-framework oracle: the per-step posterior must
match the JAX exact GP (tests/test_torch_baseline.py).

Usage:
    python benchmarking/torch_fs_baseline.py -param params_car_residual_fs \
        --ns 500 --steps 50 [--data <data.pkl with input_traj>]
Prints sampled steps/s for the host-CPU torch pipeline.
"""

import argparse
import os
import pickle
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rbf_kernel(X1, X2, ls, os_):
    """Batched ARD-RBF: X1 (..., N, D), X2 (..., M, D) -> (..., N, M).

    ls (..., D), os_ (...,) broadcast over the batch dims — the value-only
    kernel of the reference's `use_model_without_derivatives` mode.
    """
    d = (X1.unsqueeze(-2) - X2.unsqueeze(-3)) / ls.unsqueeze(-2).unsqueeze(-2)
    return os_[..., None, None] * torch.exp(-0.5 * (d ** 2).sum(-1))


def gp_posterior(Z, y, x, ls, os_, noise):
    """Full-refit batched posterior at ONE point per batch element.

    Z (B, N, D), y (B, N), x (B, 1, D) -> mean (B,), var (B,).
    Factorizes the whole (N, N) kernel per call — the reference's
    per-step `train_hallucinated_dynGP` cost profile.
    """
    K = rbf_kernel(Z, Z, ls, os_)
    K = K + noise[..., None, None] * torch.eye(Z.shape[-2],
                                               dtype=Z.dtype)
    L = torch.linalg.cholesky(K)
    kx = rbf_kernel(Z, x, ls, os_)                      # (B, N, 1)
    alpha = torch.cholesky_solve(y.unsqueeze(-1), L)    # (B, N, 1)
    mean = (kx.squeeze(-1) * alpha.squeeze(-1)).sum(-1)
    v = torch.linalg.solve_triangular(L, kx, upper=False)
    kxx = os_
    var = (kxx - (v.squeeze(-1) ** 2).sum(-1)).clamp_min(0.0)
    return mean, var


def run(params, spec, data, ns: int, steps: int, U: np.ndarray,
        seed: int = 0) -> dict:
    """Roll ns sampled car-residual dynamics for `steps` steps (torch f64).

    Mirrors sampling_gpmpc_tpu.reachability.forward_sample_rollout's
    semantics with the reference's per-step-refit execution strategy.
    """
    from sampling_gpmpc_tpu.envs import make_env

    torch.manual_seed(seed)
    dt = spec.dt
    g_ny = spec.g_ny
    env = make_env(spec, params)
    Z0, Y0 = env.training_grid()                 # (N, 2), (g_ny, N, 1+D)
    Z0 = torch.as_tensor(np.asarray(Z0), dtype=torch.float64)
    y0 = torch.as_tensor(np.asarray(Y0)[..., 0], dtype=torch.float64)

    gp = spec.gp
    ls = torch.as_tensor(np.asarray(gp.lengthscale), dtype=torch.float64)
    os_ = torch.as_tensor(np.asarray(gp.outputscale), dtype=torch.float64)
    noise = torch.full((g_ny,), float(gp.noise) + float(gp.task_noises[0]),
                       dtype=torch.float64)
    beta = float(gp.beta)

    # batch over (ns, g_ny): shared real set, per-realization hallucinations
    B = ns * g_ny
    Zb = Z0.unsqueeze(0).expand(B, -1, -1).clone()       # (B, N, 2)
    yb = y0.unsqueeze(0).expand(ns, -1, -1).reshape(B, -1).clone()
    lsb = ls.unsqueeze(0).expand(ns, -1, -1).reshape(B, 2)
    osb = os_.unsqueeze(0).expand(ns, -1).reshape(B)
    nsb = noise.unsqueeze(0).expand(ns, -1).reshape(B)

    x = torch.as_tensor(np.asarray(data.start),
                        dtype=torch.float64).expand(ns, -1).clone()
    Ut = torch.as_tensor(U[:steps], dtype=torch.float64)
    use_fb = spec.use_feedback and data.K_fb is not None
    if use_fb:
        K_fb = torch.as_tensor(np.asarray(data.K_fb), dtype=torch.float64)
        x_eq = torch.as_tensor(np.asarray(data.goal), dtype=torch.float64)

    traj = [x.numpy().copy()]
    t0 = time.perf_counter()
    for t in range(steps):
        u = Ut[t].expand(ns, -1)
        if use_fb:
            u = u - (x_eq.unsqueeze(0) - x) @ K_fb.T
        # GP inputs (phi, delta) per realization
        zq = torch.stack([x[:, 2], u[:, 0]], dim=1)          # (ns, 2)
        zb = zq.unsqueeze(1).expand(ns, g_ny, 2).reshape(B, 1, 2)
        # the reference REBUILDS + refactorizes the full GP here
        mean, var = gp_posterior(Zb, yb, zb, lsb, osb, nsb)
        sd = var.sqrt()
        samp = mean + sd * torch.randn(B, dtype=torch.float64)
        samp = torch.clamp(samp, mean - beta * sd, mean + beta * sd)
        zero = var <= float(gp.variance_is_zero)
        samp = torch.where(zero, mean, samp)

        g = samp.reshape(ns, g_ny)
        # x+ = f_known + v * I(4x3) g  (ref: car_model_residual.py:184-209)
        v = x[:, 3]
        x = torch.stack([
            x[:, 0] + v * g[:, 0],
            x[:, 1] + v * g[:, 1],
            x[:, 2] + v * g[:, 2],
            x[:, 3] + u[:, 1] * dt,
        ], dim=1)
        traj.append(x.numpy().copy())
        # iterative conditioning: append the sampled values
        Zb = torch.cat([Zb, zb], dim=1)
        yb = torch.cat([yb, samp.unsqueeze(1)], dim=1)
    dt_total = time.perf_counter() - t0
    X = np.stack(traj)
    return {"X_traj": X, "seconds": dt_total,
            "steps_per_s": ns * steps / dt_total,
            "nan_frac": float(np.isnan(X).mean())}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-param", default="params_car_residual_fs")
    parser.add_argument("--ns", type=int, default=None)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--data", default=None,
                        help="data.pkl whose input_traj to replay")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import dataclasses
    from sampling_gpmpc_tpu.config import load_problem

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", args.param + ".yaml"))
    ns = args.ns or spec.ns
    spec = dataclasses.replace(spec, ns=ns)
    if args.data:
        with open(args.data, "rb") as f:
            rec = pickle.load(f)
        U = np.asarray(rec["input_traj"][0])[:args.steps]
    else:
        U = np.zeros((args.steps, spec.nu))

    out = run(params, spec, data, ns, min(args.steps, len(U)), U,
              seed=args.seed)
    print(f"torch f64 CPU (reference-shaped per-step refit): "
          f"{out['steps_per_s']:.0f} sampled steps/s "
          f"({out['seconds']:.1f}s for ns={ns} x {args.steps} steps, "
          f"nan frac {out['nan_frac']:.3f})")


if __name__ == "__main__":
    main()
