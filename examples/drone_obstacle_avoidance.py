"""Drone obstacle avoidance with the approximate sampling MPC.

Counterpart of the reference demo (ref:
extra/approx_sampling_mpc/demo_obstacle_avoidance.py): the drone tracks a
heart-shaped reference path through circular obstacles using the BLR
nominal model with sampled-trajectory constraint tightenings.

Usage:
    python examples/drone_obstacle_avoidance.py [-i 1] [--iters 100]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-param", default="params_drone_obstacles_approx")
    parser.add_argument("-i", type=int, default=1)
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument("--active-learning", type=int, default=None,
                        metavar="FREQ", help="observe the true transition "
                        "every FREQ steps (common.active_learning)")
    parser.add_argument("--optimistic", action="store_true",
                        help="plan with the eta-augmented exploration OCP "
                        "(agent.run.optimistic)")
    args = parser.parse_args()

    import yaml

    from sampling_gpmpc_tpu.approx.solver import ApproxMPC
    from sampling_gpmpc_tpu.setup import default_dtype

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = yaml.safe_load(open(os.path.join(
        here, "params", args.param + ".yaml")))
    if args.active_learning is not None:
        params["common"]["active_learning"] = {
            "use": True, "frequency": int(args.active_learning)}
    if args.optimistic:
        params["agent"]["run"]["optimistic"] = True
        params["agent"]["run"]["pessimistic"] = False
    dtype = default_dtype()

    print(f"start={params['env']['start'][:2]} "
          f"obstacles={len(params['env']['obstacles'])}")
    mpc = ApproxMPC(params, dtype)
    out = mpc.run(num_iters=args.iters)

    times = out["solver_time"]
    print(f"status={out['status']} "
          f"solve time mean={np.mean(times[1:]):.4f}s std={np.std(times[1:]):.4f}s")

    out_dir = os.path.join(here, "experiments", "drone", f"env_0",
                           args.param, str(args.i))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "data_obstacles.pkl"), "wb") as f:
        pickle.dump(out, f)

    # quick figure
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    ph = np.stack(out["physical_state_traj"])
    fig, ax = plt.subplots(figsize=(7, 7))
    path = mpc.model.path_generator(0, 200)
    ax.plot(path[:, 0], path[:, 1], "g--", alpha=0.5, label="reference")
    ax.plot(ph[:, 0], ph[:, 1], "b.-", label="closed loop")
    for (cx, cy, r) in np.asarray(mpc.obstacles):
        ax.add_patch(plt.Circle((cx, cy), r, color="gray", alpha=0.6))
    ax.legend()
    ax.set_aspect("equal")
    fig.savefig(os.path.join(out_dir, "trajectory.png"), dpi=200)
    print(f"saved {out_dir}")


if __name__ == "__main__":
    main()
