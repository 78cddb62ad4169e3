"""LQR closed-loop sanity check (E10 equivalent of extra/LQR_pendulum.py).

Stabilizes the pendulum1D about the upright equilibrium with the
Riccati-synthesized ancillary gain and verifies exponential decay of the
P-weighted Lyapunov function under the *true nonlinear* dynamics.

Usage:
    python examples/lqr_sanity.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.tools.terminal_set import synthesize

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", "params_pendulum1D_samples.yaml"))
    env = make_env(spec, params)

    ts = synthesize(env, data.goal, np.zeros(spec.nu),
                    np.asarray(data.Qx), np.asarray(data.Qu),
                    data.x_min, data.x_max, data.u_min, data.u_max)
    print(f"P =\n{ts.P}\nK = {ts.K}\nrho = {ts.rho:.4f} delta = {ts.delta:.3f}")

    x = data.goal + np.array([0.15, -0.2])
    V = []
    for k in range(400):
        err = x - data.goal
        V.append(float(err @ ts.P @ err))
        u = -ts.K @ (data.goal - x)         # config: u = -K(x_eq - x)
        x = np.asarray(env.discrete_dyn(jnp.asarray(x), jnp.asarray(u)))
    V = np.asarray(V)
    print("V(0) =", V[0], " V(end) =", V[-1])
    # rho ~ 0.99 per step: expect ~ rho^(2*400) contraction
    assert V[-1] < 1e-2 * V[0], "no Lyapunov decay - check the gain"
    assert np.all(np.diff(V) < 1e-9), "V must decrease monotonically"
    print("Lyapunov decay OK (closed loop stabilizes the upright state)")


if __name__ == "__main__":
    main()
