"""Round-4 probe: empty-hall GP stage, warm QP, and scan-megastep timing."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGPMPC_DTYPE", "float32")
import jax, jax.numpy as jnp
from bench import build, setup_closed_loop, time_closed_loop

dtype = jnp.float32
params, spec, data, env = build({"num_mpc_iter": 23})
dev = jax.devices()[0]

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
st, X, U, gp, eps, ocp, hyp = jax.device_put((st, X, U, gp, eps, ocp, hyp), dev)
eps0 = eps[0]


def bt(fn, args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# empty-hall GP stage (what the bench solve actually runs)
def stage_gp_empty(st, X, U, gp, eps0):
    xu = sqp._linearization_inputs(spec, ocp, X, U)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
    dg, gp2 = agent_mod.sample_dynamics(spec, env, hyp, gp, Xt, eps0,
                                        hall_empty=True)
    return dg, gp2

f1 = jax.jit(stage_gp_empty)
print("gp_sample EMPTY-HALL   %.3f ms" % (bt(f1, (st, X, U, gp, eps0)) * 1e3))

# same without the hallucination append (dist matrix + dedup + writes)
_saved = agent_mod.append_hall
agent_mod.append_hall = lambda *a, **k: a[2]
f1b = jax.jit(stage_gp_empty)
print("gp EMPTY, no append    %.3f ms" % (bt(f1b, (st, X, U, gp, eps0)) * 1e3))
agent_mod.append_hall = _saved

# chained closed-loop step timing (current bench path)
if not os.environ.get("SGPMPC_PROBE_SCAN_ONLY"):
    step, carry0, epsm = setup_closed_loop(spec, data, env, dev, dtype)
    dt = time_closed_loop(step, carry0, epsm, n_warmup=3, n_iter=20)
    print("closed-loop chained    %.3f ms/step  (%.1f solves/s)"
          % (dt * 1e3, 1/dt))
# fresh (undonated) carry for the scan runs
_, carry0, epsm = setup_closed_loop(spec, data, env, dev, dtype)

# scan megastep: the whole timed window as ONE jitted computation
from bench import _mpc_step
from sampling_gpmpc_tpu.dempc import shift_solution
K_fb = (jnp.asarray(data.K_fb, dtype) if spec.use_feedback else None)
goal = jnp.asarray(data.goal, dtype)

def scan_loop(carry, eps_all):
    def body(c, eps_m):
        x, X, U, gp, ws, wv = c
        out = _mpc_step(spec, env, hyp, ocp, x, X, U, gp, ws, wv, eps_m,
                        K_fb, goal, shift_solution)
        return out, out[0]
    return jax.lax.scan(body, carry, eps_all)

jscan = jax.jit(scan_loop)
epsd = jax.device_put(epsm, dev)
with jax.default_device(dev):
    t_compile0 = time.perf_counter()
    carry, xs = jscan(carry0, epsd[:3])
    jax.block_until_ready(xs)
    print("# scan compile+run: %.1f s" % (time.perf_counter() - t_compile0))
    for rep in range(3):
        carry2, _ = jscan(carry0, epsd[:3])   # warm transient
        t0 = time.perf_counter()
        carry2, xs = jscan(carry2, epsd[3:])
        jax.block_until_ready(xs)
        dt_scan = (time.perf_counter() - t0) / (epsm.shape[0] - 3)
        print("scan megastep rep%d     %.3f ms/step  (%.1f solves/s)"
              % (rep, dt_scan * 1e3, 1/dt_scan))
