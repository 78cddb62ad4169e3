"""Diff our closed loop against the reference implementation (BASELINE 1e-3).

The BASELINE parity target is "``params_car_residual`` closed-loop
trajectory within 1e-3 of the reference".  The reference run needs acados
(+ CasADi + GPyTorch), which this image does not ship — so this script is
the *ready-to-run* harness VERDICT #1 asks for: it imports the reference
from ``--reference`` (default /root/reference), runs the identical config
through BOTH stacks, and diffs the recorded trajectories.  When the
reference's dependencies are absent it reports exactly what is missing and
exits 0 (skip), so it can sit in CI and light up the moment acados
appears.

The committed goldens (tests/goldens/*.npz, ``sampling_gpmpc_tpu.tools
.goldens``) hold our side of the diff at full reference length; this
script re-runs our side fresh by default to also catch config-porting
drift.

Usage:
    python benchmarking/compare_vs_reference.py \
        [-param params_car_residual] [--reference /root/reference] \
        [--tol 1e-3] [--use-golden]

Reference flow being driven: main.py:34-87 wiring, src/DEMPC.py:29-80
closed loop, src/visu.py:475-517 artifact contract.
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

import numpy as np


def try_import_reference(ref_root: str):
    """Import the reference's module stack; return (modules, missing)."""
    missing = []
    for dep in ("torch", "gpytorch", "casadi", "acados_template"):
        try:
            importlib.import_module(dep)
        except ImportError:
            missing.append(dep)
    if missing:
        return None, missing
    sys.path.insert(0, ref_root)
    try:
        mods = {
            "DEMPC": importlib.import_module("src.DEMPC"),
            "visu": importlib.import_module("src.visu"),
            "agent": importlib.import_module("src.agent"),
            "envs": {
                "pendulum": importlib.import_module(
                    "src.environments.pendulum"),
                "Pendulum1D": importlib.import_module(
                    "src.environments.pendulum1D"),
                "bicycle": importlib.import_module(
                    "src.environments.car_model"),
                "bicycle_Bdx": importlib.import_module(
                    "src.environments.car_model_residual"),
            },
        }
    except Exception as e:       # noqa: BLE001 - report, don't crash CI
        return None, [f"reference import failed: {e!r}"]
    return mods, []


def run_reference(ref_root: str, config: str, workdir: str) -> dict:
    """Drive the reference stack on `config` (mirrors main.py:34-87)."""
    import yaml

    mods, missing = try_import_reference(ref_root)
    assert mods is not None, missing

    import torch

    with open(os.path.join(ref_root, "params", config + ".yaml")) as fh:
        params = yaml.load(fh, Loader=yaml.FullLoader)
    params["env"]["i"] = 0
    params["env"]["name"] = 0
    params["common"]["use_cuda"] = False
    if params["experiment"]["rnd_seed"]["use"]:
        torch.manual_seed(params["experiment"]["rnd_seed"]["value"])

    env_cls_name = {"pendulum": "Pendulum", "Pendulum1D": "Pendulum",
                    "bicycle": "CarKinematicsModel",
                    "bicycle_Bdx": "CarKinematicsModel"}
    dyn = params["env"]["dynamics"]
    env_model = getattr(mods["envs"][dyn], env_cls_name[dyn])(params)
    agent = mods["agent"].Agent(params, env_model)
    os.makedirs(workdir, exist_ok=True)
    visu = mods["visu"].Visualizer(params=params, path=workdir, agent=agent)
    agent.update_current_state(np.array(params["env"]["start"]))
    de_mpc = mods["DEMPC"].DEMPC(params, visu, agent)
    de_mpc.dempc_main()
    return {
        "physical_state_traj": np.stack(
            [np.asarray(x).reshape(-1) for x in visu.physical_state_traj]),
        "state_traj": [np.asarray(x) for x in visu.state_traj],
        "input_traj": [np.asarray(u) for u in visu.input_traj],
    }


def run_ours(config: str) -> dict:
    from sampling_gpmpc_tpu.tools.goldens import run_closed_loop
    out = run_closed_loop(config)
    return {
        "physical_state_traj": out["physical_state_traj"],
        "last_plan_X": out["last_plan_X"],
        "u0_traj": out["u0_traj"],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-param", default="params_car_residual")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--use-golden", action="store_true",
                    help="diff the committed golden instead of a fresh run")
    ap.add_argument("--workdir", default="/tmp/ref_compare")
    args = ap.parse_args()

    mods, missing = try_import_reference(args.reference)
    if mods is None:
        print(f"SKIP: reference stack unavailable (missing: "
              f"{', '.join(str(m) for m in missing)}); install acados + "
              f"casadi + gpytorch to run the 1e-3 parity diff")
        return 0

    print(f"running reference {args.param} from {args.reference} ...")
    ref = run_reference(args.reference, args.param, args.workdir)

    os.environ["SGPMPC_DTYPE"] = "float64"
    from sampling_gpmpc_tpu.setup import enable_x64, force_cpu_mesh
    force_cpu_mesh(8)
    enable_x64()
    if args.use_golden:
        from sampling_gpmpc_tpu.tools.goldens import load_golden
        ours = load_golden(args.param)
    else:
        print(f"running ours {args.param} ...")
        ours = run_ours(args.param)

    a = ref["physical_state_traj"]
    b = ours["physical_state_traj"]
    n = min(a.shape[0], b.shape[0])
    diff = np.abs(a[:n] - b[:n])
    worst = float(diff.max())
    print(f"closed-loop physical states: {n} steps, "
          f"max|diff| = {worst:.3e} (tol {args.tol:g})")
    per_step = diff.max(axis=tuple(range(1, diff.ndim)))
    first_bad = int(np.argmax(per_step > args.tol)) if worst > args.tol else -1
    if worst > args.tol:
        print(f"FAIL: first divergence at MPC step {first_bad} "
              f"(|diff| = {per_step[first_bad]:.3e})")
        return 1
    print("PASS: closed-loop trajectories match within tolerance")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
