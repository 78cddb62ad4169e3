"""Visualization CLI: replay a recorded data.pkl into figures/video.

Counterpart of the reference visu_main.py: loads the artifact, recomputes
velocity-dependent tightenings for the residual car, renders the
trajectory figure and (optionally) a frame-by-frame video.

Usage:
    python visu_main.py -param params_pendulum1D_samples -env 0 -i 42 [--video]
"""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-param", default="params_pendulum1D_samples")
    parser.add_argument("-env", type=int, default=0)
    parser.add_argument("-i", type=int, default=42)
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--plot-koller", action="store_true",
                        help="overlay the robust-tube baseline's ellipses "
                             "from koller_*.pkl written by "
                             "benchmarking/robust_tube_baseline.py "
                             "(ref: visu_main.py:79-85)")
    args = parser.parse_args()

    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.recorder import Recorder
    from sampling_gpmpc_tpu.tightening import reachable_set_ball
    from sampling_gpmpc_tpu.visu import render_run

    here = os.path.dirname(os.path.abspath(__file__))
    params, spec, data = load_problem(
        os.path.join(here, "params", args.param + ".yaml"))
    run_dir = os.path.join(
        here, "experiments", params["experiment"]["folder"],
        f"env_{args.env}", args.param, str(args.i))
    artifact = os.path.join(run_dir, "data.pkl")
    if not os.path.exists(artifact):
        raise SystemExit(f"no artifact at {artifact} — run main.py with the "
                         f"same -param/-env/-i first")
    rec = Recorder.load(artifact)

    tilde_eps, P = None, None
    if spec.use_tightening and data.P_term is not None:
        P = data.P_term
        if spec.env_name == "bicycle_Bdx":
            # recompute with the realized velocity profile
            # (ref: visu_main.py:71-75)
            X0 = np.asarray(rec["state_traj"][0]).reshape(spec.H + 1, -1,
                                                          spec.nx)
            tilde_eps, _ = reachable_set_ball(params, X0[:, 0, 3])
        else:
            tilde_eps = data.tilde_eps

    koller = None
    if args.plot_koller:
        import pickle
        kp = os.path.join(run_dir, "koller_ellipse_data.pkl")
        if not os.path.exists(kp):
            raise SystemExit(f"no {kp} — run benchmarking/"
                             f"robust_tube_baseline.py with the same "
                             f"-param/-env/-i first")
        koller = {"ellipses": pickle.load(open(kp, "rb"))}
        for key, name in (("centers", "koller_ellipse_center_data.pkl"),
                          ("true", "koller_true_data.pkl")):
            fp = os.path.join(run_dir, name)
            if os.path.exists(fp):
                koller[key] = pickle.load(open(fp, "rb"))

    path = render_run(rec, params, run_dir, tilde_eps=tilde_eps, P=P,
                      video=args.video, koller=koller)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
