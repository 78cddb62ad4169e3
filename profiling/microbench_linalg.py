"""XLA vs Pallas lane-batched linalg at production GP-stage shapes (TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from sampling_gpmpc_tpu.ops import batch_linalg as bl

dev = jax.devices()[0]
print("device:", dev)
rng = np.random.default_rng(0)

def bt(fn, args, n=200):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e6  # us

for B, R in [(64, 60), (64, 108), (128, 60), (512, 60)]:
    A = rng.standard_normal((B, R, R)).astype(np.float32)
    S = jax.device_put(jnp.asarray(A @ np.swapaxes(A, -1, -2) + 3*np.eye(R, dtype=np.float32)), dev)
    Rhs = jax.device_put(jnp.asarray(rng.standard_normal((B, R, 8)).astype(np.float32)), dev)
    xla_c = jax.jit(jnp.linalg.cholesky)
    pal_c = jax.jit(jax.vmap(bl.chol))
    t_x = bt(xla_c, (S,)); t_p = bt(pal_c, (S,))
    L = xla_c(S)
    xla_t = jax.jit(lambda L, R: jax.scipy.linalg.solve_triangular(L, R, lower=True))
    pal_t = jax.jit(jax.vmap(bl.tri_solve))
    tt_x = bt(xla_t, (L, Rhs)); tt_p = bt(pal_t, (L, Rhs))
    print(f"B={B:4d} R={R:3d}  chol: xla {t_x:7.1f}us  pallas {t_p:7.1f}us | trisolve(m=8): xla {tt_x:7.1f}us  pallas {tt_p:7.1f}us")
