"""Trace the warm closed-loop MPC step (the bench workload) and dump the
per-op device-time breakdown.

Usage: python profiling/closed_loop_trace.py [/tmp/cl_trace]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGPMPC_DTYPE", "float32")
import jax
import jax.numpy as jnp

from bench import build, setup_closed_loop, time_closed_loop

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cl_trace"
dtype = jnp.float32
n_warmup, n_iter = 3, 20
params, spec, data, env = build({"num_mpc_iter": n_warmup + n_iter})
dev = jax.devices()[0]
step, carry0, eps = setup_closed_loop(spec, data, env, dev, dtype)
dt = time_closed_loop(step, carry0, eps, n_warmup, n_iter)
print(f"warm closed-loop step: {dt*1e3:.3f} ms ({1/dt:.1f} solves/s)")

N_TRACED = 10
carry = carry0
with jax.profiler.trace(trace_dir):
    for m in range(N_TRACED):
        carry = step(carry, eps[m % eps.shape[0]])
    carry[0].block_until_ready()
print(f"traced {N_TRACED} steps -> {trace_dir}")
