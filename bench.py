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
import sys
import time

os.environ.setdefault("SGPMPC_DTYPE", "float32")

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


def main():
    dtype = jnp.float32
    params, spec, data, env = build()
    profile_dir = os.environ.get("SGPMPC_PROFILE")

    dev = jax.devices()[0]
    fn, args = setup_solve(spec, data, env, dev, dtype)
    dt_dev = time_solve(fn, args)
    if profile_dir:
        # one traced window for jax.profiler / xprof (SURVEY §5 tracing)
        with jax.profiler.trace(profile_dir):
            time_solve(fn, args, n_warmup=0, n_iter=5)
        print(f"# trace written to {profile_dir}", file=sys.stderr)
    solves_per_s = 1.0 / dt_dev

    # host-CPU baseline of the identical computation
    vs_baseline = 1.0
    if dev.platform != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            fn_c, args_c = setup_solve(spec, data, env, cpu, dtype)
            dt_cpu = time_solve(fn_c, args_c, n_warmup=1, n_iter=3)
            vs_baseline = dt_cpu / dt_dev
        except Exception as e:  # noqa: BLE001
            print(f"# cpu baseline failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "sqp_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s (ns=64, H=20, full GP-sampling SQP-RTI step)",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
