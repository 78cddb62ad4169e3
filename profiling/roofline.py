"""Roofline / MFU accounting for the warm closed-loop step (VERDICT r4 #5).

Pulls FLOP and memory-traffic counts from XLA's cost model for the
compiled closed-loop window (the exact executable the bench times),
divides by the window length, and compares against v5e peak numbers to
state the achieved fraction and the speed-of-light step time.

Peaks used (per v5e chip, public spec): 197 TFLOP/s bf16 MXU,
~49 TFLOP/s for f32-accumulated 3-pass matmuls at HIGHEST precision
(1/4 of bf16: 3 passes + accumulate overhead; the conservative bound),
819 GB/s HBM bandwidth.

Run: python profiling/roofline.py          (TPU; falls back to CPU
     compile for the counts — XLA FLOP counts are platform-independent)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGPMPC_DTYPE", "float32")
import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from bench import build, build_car, setup_closed_loop_scan    # noqa: E402

PEAK_F32_MXU = 49e12       # f32 HIGHEST-precision matmul throughput
PEAK_VPU = 4e12            # f32 elementwise ops/s (8x128x8 @ 940 MHz x FMA)
PEAK_HBM = 819e9           # bytes/s


def pallas_gp_flops(ns, Ht, R):
    """Analytic FLOPs of the fused empty-hall GP kernel (one output) —
    XLA's cost model cannot see inside custom calls.  MXU part: V, G,
    mean, draw; VPU part: the masked full-array Cholesky sweep
    (~5 ops/element/step, Ht steps over (ns, Ht, Ht))."""
    mxu = ns * (2 * R * R * Ht + 2 * R * Ht * Ht + 2 * R * Ht
                + 2 * Ht * Ht)
    vpu = 5 * ns * Ht ** 3
    return mxu, vpu


def pallas_hall_flops(ns, Ht, Rr, Rh, fill):
    """Analytic FLOPs of the fused hall-block kernel (one output).
    Sweeps are bounded by the fill count (dynamic no-op elision)."""
    mxu = ns * (2 * Rr * Rr * (Ht + Rh)        # V_r, C
                + 2 * Rr * Rh * (Rh + Ht + 1)  # C'C, V_r'C, w_r C
                + 2 * Rr * Ht * (Ht + 1)       # V_r'V_r, w_r V_r
                + 2 * Ht * Rh * (Ht + 1)       # V_h'V_h, w_h'V_h
                + 2 * Ht * Ht)                 # draw
    vpu = 5 * ns * (fill * Rh * Rh             # Schur chol sweep
                    + fill * (Ht + 1) * Rh     # substitution sweep
                    + Ht ** 3)                 # cov chol sweep
    return mxu, vpu


def analyze(tag, spec, data, env, n_window=20):
    dev = jax.devices()[0]
    run, carry0, eps = setup_closed_loop_scan(spec, data, env, dev,
                                              jnp.float32)
    w = eps[:n_window]
    # reach the jitted loop inside the run closure
    import bench
    lowered = None
    # rebuild the loop directly for lowering (same code path as run())
    from functools import partial
    jloop = run.__closure__  # noqa: F841  (documentation only)
    # simplest: trace through run's jit by lowering a wrapper
    f = jax.jit(lambda c, e: run(c, e))
    try:
        comp = f.lower(carry0, w).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: cost analysis unavailable ({e})")
        return
    flops = ca.get("flops", 0.0)
    bytes_ = ca.get("bytes accessed", 0.0)
    per_step_fl = flops / n_window
    per_step_by = bytes_ / n_window
    t_flop = per_step_fl / PEAK_F32_MXU
    t_mem = per_step_by / PEAK_HBM
    sol = max(t_flop, t_mem)
    print(f"{tag}: {per_step_fl/1e6:.1f} MFLOP/step, "
          f"{per_step_by/1e6:.1f} MB accessed/step")
    print(f"  speed-of-light: compute {t_flop*1e6:.1f} us, "
          f"memory {t_mem*1e6:.1f} us -> bound {sol*1e6:.1f} us/step "
          f"({'memory' if t_mem > t_flop else 'compute'}-bound)")
    return per_step_fl, per_step_by, sol


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].platform}")
    params, spec, data, env = build({"num_mpc_iter": 23})
    r1 = analyze("pendulum1D ns=64 H=20 (1 RTI iter)", spec, data, env)
    _, specc, datac, envc = build_car({"num_mpc_iter": 23})
    r2 = analyze("car ns=20 H=15 (4 SQP iters)", specc, datac, envc)

    # fold in the Pallas-kernel arithmetic (invisible to the XLA model)
    Ht = spec.H * spec.Ty
    R = 36 * spec.Ty            # pendulum1D 6x6 grid x tasks
    m1, v1 = pallas_gp_flops(spec.ns, Ht, R)
    print(f"pendulum GP kernel (analytic): {m1/1e6:.0f} MF MXU "
          f"({m1/PEAK_F32_MXU*1e6:.1f} us) + {v1/1e6:.0f} MF VPU "
          f"({v1/PEAK_VPU*1e6:.1f} us)")
    Htc = specc.H * specc.Ty
    mx = vp = 0.0
    for it in range(1, specc.max_sqp_iter):
        m, v = pallas_hall_flops(specc.ns, Htc, 180, 240,
                                 it * specc.H * specc.Ty)
        mx += m * specc.g_ny
        vp += v * specc.g_ny
    m0, v0 = pallas_gp_flops(specc.ns, Htc, 180)
    mx += m0 * specc.g_ny
    vp += v0 * specc.g_ny
    print(f"car GP kernels/step (analytic): {mx/1e6:.0f} MF MXU "
          f"({mx/PEAK_F32_MXU*1e6:.1f} us) + {vp/1e6:.0f} MF VPU "
          f"({vp/PEAK_VPU*1e6:.1f} us)")

    if r1:
        # measured warm step from the bench slope (update when re-measured)
        for meas_ms in (0.33,):
            fl, by, sol = r1
            fl_tot = fl + m1 + v1
            sol_tot = max(sol, m1 / PEAK_F32_MXU + v1 / PEAK_VPU)
            print(f"pendulum: measured ~{meas_ms} ms/step -> "
                  f"{fl_tot/1e6:.0f} MFLOP/step total, MFU "
                  f"{fl_tot / (meas_ms*1e-3) / PEAK_F32_MXU * 100:.2f} % "
                  f"of f32 peak, HBM {by / (meas_ms*1e-3) / PEAK_HBM * 100:.1f} % "
                  f"of peak, {meas_ms*1e-3/sol_tot:.0f}x above speed-of-light")
