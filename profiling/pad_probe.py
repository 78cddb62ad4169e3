"""Micro-probe: which padding/transpose op dominates the fused-QP floor."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGPMPC_DTYPE", "float32")
import jax, jax.numpy as jnp

dev = jax.devices()[0]
f32 = jnp.float32
m_h, nU = 7720, 20
m_hp, nU_p = 7808, 24

G = jax.device_put(jnp.ones((m_h, nU), f32), dev)
GT = jax.device_put(jnp.ones((nU, m_h), f32), dev)
halfG = jax.device_put(jnp.ones((m_h // 2, nU), f32), dev)


def bt(fn, args, n=200):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


probes = {
    "transpose (m,nU)->(nU,m)": jax.jit(lambda G: G.T + 0.0),
    "transpose+pad": jax.jit(lambda G: jnp.pad(G.T, ((0, nU_p - nU), (0, m_hp - m_h)))),
    "pad pre-transposed": jax.jit(lambda GT: jnp.pad(GT, ((0, nU_p - nU), (0, m_hp - m_h)))),
    "concat +- rows (m,nU)": jax.jit(lambda h: jnp.concatenate([h, -h], 0)),
    "concat +- lanes (nU,m)": jax.jit(lambda GT: jnp.concatenate([GT, -GT], 1)),
    "copy (m,nU)": jax.jit(lambda G: G + 1.0),
    "copy (nU,m)": jax.jit(lambda GT: GT + 1.0),
    "reshape (m,nU)->(nU,m) via pallas-free dot": jax.jit(
        lambda G: jax.lax.dot_general(jnp.eye(nU, dtype=f32), G,
                                      (((1,), (1,)), ((), ())))),
}
args = {"pad pre-transposed": (GT,), "concat +- lanes (nU,m)": (GT,),
        "copy (nU,m)": (GT,), "concat +- rows (m,nU)": (halfG,)}
for name, fn in probes.items():
    a = args.get(name, (G,))
    print("%-44s %.3f ms" % (name, bt(fn, a) * 1e3))
