"""Collective-traffic accounting for the sharded solve (VERDICT r2 #9).

Compiles the ns-sharded SQP solve on a virtual mesh and extracts every
cross-device collective from the optimized HLO, with byte counts and
whether it sits inside the per-IPM-iteration while body.  The output is
the traffic side of the 2-host scaling argument (SURVEY §2.4: sample-axis
scale-out across hosts rides DCN): per-SQP-iteration cross-host bytes are
a few hundred KB while the per-iteration compute is milliseconds, so even
a ~1 GB/s effective DCN link costs well under 20 % — the >= 80 % target.
Numbers land in BENCH_NOTES.md.

Usage:  python profiling/collective_traffic.py [--n 8] [--ns 64]
"""

import argparse
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s64": 8, "u64": 8, "f16": 2, "s8": 1, "u8": 1}

COLLECTIVE_RE = re.compile(
    r"(\w[\w.\-]*)\s*=\s*((?:\([^)]*\)|\S+))\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)\(")
SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|s32|u64|u32|s8|u8|pred)"
                      r"\[([0-9,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (tuples summed)."""
    total = 0
    for dt, dims in SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


OP_NAME_RE = re.compile(r'op_name="([^"]*)"')


def collect(hlo_text: str):
    """[(op_kind, bytes, loop_depth)] for every collective.

    loop_depth = number of enclosing lax.while loops, read off the op's
    metadata op_name path (XLA records the full tracing path, e.g.
    ``.../shard_map/while/body/while/body/psum``).  For this solver the
    program structure makes the depths interpretable:

    * depth 0 — collectives of the statically PEELED first SQP iteration's
      body level (condensed-cost psum, convergence norms, qscale pmax):
      the per-SQP-iteration body-level collective set, executed once;
    * depth 1 — the peeled iteration's PDIP while body (executed once per
      PDIP trip of the first QP) PLUS the in-loop SQP body-level set;
    * depth 2 — the in-loop QPs' PDIP while body (once per PDIP trip).
    """
    out = []
    for line in hlo_text.splitlines():
        m = COLLECTIVE_RE.search(line)
        if not m:
            continue
        nm = OP_NAME_RE.search(line)
        depth = nm.group(1).count("while/body") if nm else 0
        out.append((m.group(3), shape_bytes(m.group(2)), depth))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="mesh devices")
    ap.add_argument("--ns", type=int, default=64)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"])
    ap.add_argument("--ordered", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SGPMPC_DTYPE", args.dtype)
    from sampling_gpmpc_tpu.setup import enable_x64, force_cpu_mesh
    force_cpu_mesh(args.n)
    if args.dtype == "float64":
        enable_x64()

    import jax
    import jax.numpy as jnp

    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.ocp import sqp
    from sampling_gpmpc_tpu.ocp.spec import make_ocp_data
    from sampling_gpmpc_tpu.parallel.mesh import sample_mesh
    from sampling_gpmpc_tpu.parallel.sharded import make_sharded_solve
    from sampling_gpmpc_tpu.setup import default_dtype

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", "params_pendulum1D_samples.yaml"))
    spec = dataclasses.replace(spec, ns=args.ns, num_mpc_iter=1,
                               max_sqp_iter=3, tol_nlp=0.0)
    params["agent"]["num_dyn_samples"] = spec.ns
    env = make_env(spec, params)
    dtype = default_dtype()
    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    eps = agent_mod.make_epistemic(jax.random.PRNGKey(0), spec, dtype)[0]
    st = jnp.asarray(data.start, dtype)

    mesh = sample_mesh(args.n)
    solve = make_sharded_solve(spec, env, hyp, ocp, mesh,
                               ordered=args.ordered)
    hlo = jax.jit(solve).lower(st, X, U, gp, eps).compile().as_text()

    cols = collect(hlo)
    per_kind = {}
    by_depth = {}
    for kind, b, d in cols:
        per_kind.setdefault((kind, d), [0, 0])
        per_kind[(kind, d)][0] += 1
        per_kind[(kind, d)][1] += b
        by_depth[d] = by_depth.get(d, 0) + b

    print(f"mesh n={args.n}, ns={args.ns}, dtype={args.dtype}, "
          f"ordered={args.ordered}")
    print(f"{'collective':20s} {'loop depth':>10s} {'count':>6s} "
          f"{'bytes':>12s}")
    for (kind, d), (cnt, b) in sorted(per_kind.items()):
        print(f"{kind:20s} {d:10d} {cnt:6d} {b:12d}")
    print("\nbytes by loop depth (see collect() docstring):")
    for d in sorted(by_depth):
        print(f"  depth {d}: {by_depth[d]} bytes")

    # 2-host scaling model: per-SQP-iteration cross-HOST traffic when the
    # sample axis spans 2 hosts = body-level set (depth 0, the peeled
    # copy) + PDIP-body set (depth 2) x measured PDIP trips (~33 warm),
    # against the measured per-SQP-iteration compute time (BENCH_NOTES
    # stage breakdown: 4.5 ms at the bench shape on v5e)
    ipm_trips = 33
    per_sqp = by_depth.get(0, 0) + by_depth.get(2, 0) * ipm_trips
    n_body = sum(c for (k, d), (c, b) in per_kind.items() if d == 0)
    n_pdip = sum(c for (k, d), (c, b) in per_kind.items() if d == 2)
    n_coll = n_body + n_pdip * ipm_trips
    print(f"\nper-SQP-iteration cross-host payload @ {ipm_trips} PDIP "
          f"trips: {per_sqp} bytes across {n_coll} sequentially-dependent "
          f"collectives\n({n_body} at SQP body level + {n_pdip} per PDIP "
          f"trip)")
    # the collectives are dependency-chained (Schur -> solve -> residual
    # -> step length), so per-collective LATENCY dominates bandwidth at
    # these payloads; model both
    c_ms = 4.5
    print(f"compute per SQP iteration (BENCH_NOTES stage breakdown): "
          f"{c_ms} ms")
    for lat_us, bw_gbps, label in (
            (1.0, 45.0, "ICI within a v5e pod slice (2 hosts, 1 us hop)"),
            (5.0, 45.0, "ICI, conservative 5 us"),
            (25.0, 25.0, "DCN across pod slices (25 us RTT)")):
        t_comm_ms = (n_coll * lat_us * 1e-3
                     + per_sqp / (bw_gbps * 1e9) * 1e3)
        eff = c_ms / (c_ms + t_comm_ms)
        print(f"{label}: comm {t_comm_ms:.3f} ms "
              f"-> efficiency {eff:.1%}")
    print("\nthe reachability scale-out (make_sharded_rollout) has ZERO "
          "collectives\n(realizations independent; per-shard PRNG folds) "
          "-> ~100% scaling on any link,\nwhich is the reference's actual "
          "multi-node workload (SLURM array).")


if __name__ == "__main__":
    main()
