"""Iterative GP conditioning visualization (E7 equivalent).

Reproduces the reference's conditioning demos (ref:
extra/plot_GP_conditioning.py, conditioning_gp.py, sample_gp.py): draw a
few GP function realizations on a 1-D problem, then append each
realization's own samples at a handful of points and re-sample — showing
that each realization is consistently pinned at its conditioned points
(the mechanism behind sampling-within-SQP).

Usage:
    python examples/gp_conditioning_demo.py [--out demo.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="experiments/gp_conditioning_demo.png")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sampling_gpmpc_tpu.gp import exact
    from sampling_gpmpc_tpu.setup import enable_x64

    enable_x64()
    ls, os_ = np.array([0.6]), 1.0
    noise = np.array([1e-6])
    f = lambda x: np.sin(3 * x) * 0.8

    # real training data: 5 noisy observations of f
    Zr = np.linspace(-1.5, 1.5, 5)[:, None]
    Yr = f(Zr)
    grid = np.linspace(-2, 2, 120)[:, None]

    rf = exact.factor_real(jnp.asarray(Zr), jnp.asarray(Yr), ls, os_,
                           jnp.asarray(noise), 1e-10, False)

    key = jax.random.PRNGKey(0)
    n_realizations = 4
    cond_pts = np.array([[-0.8], [0.2], [1.1]])

    fig, axes = plt.subplots(1, 2, figsize=(11, 4), sharey=True)
    colors = plt.cm.viridis(np.linspace(0.1, 0.85, n_realizations))

    # stage 1: plain posterior draws at the conditioning points
    empty_Z = jnp.full((1, 1), 1e5)
    empty_Y = jnp.full((1, 1), jnp.nan)
    uf0 = exact.condition_update(rf, jnp.asarray(Zr), empty_Z, empty_Y,
                                 ls, os_, jnp.asarray(noise), 1e-10, False)
    mean_p, cov_p = exact.predict_update(
        jnp.asarray(cond_pts), jnp.asarray(Zr), empty_Z, rf, uf0, ls, os_,
        1e-10, False)
    samples = []
    for i in range(n_realizations):
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, (cond_pts.shape[0],))
        samples.append(np.asarray(
            exact.posterior_sample(mean_p, cov_p, eps, 1e-10)))

    for stage, ax in enumerate(axes):
        mg, cg = exact.predict_update(
            jnp.asarray(grid), jnp.asarray(Zr), empty_Z, rf, uf0, ls, os_,
            1e-10, False)
        sd = np.sqrt(np.clip(np.diag(np.asarray(cg)), 0, None))
        ax.fill_between(grid[:, 0], np.asarray(mg) - 2 * sd,
                        np.asarray(mg) + 2 * sd, alpha=0.15, color="gray")
        ax.plot(grid[:, 0], f(grid)[:, 0], "k--", alpha=0.5, label="truth")
        ax.plot(Zr[:, 0], Yr[:, 0], "ko", ms=5, label="data")

        for i in range(n_realizations):
            if stage == 0:
                # prior-to-conditioning: the per-realization posterior draw
                ax.plot(cond_pts[:, 0], samples[i], "x", color=colors[i],
                        ms=9, mew=2)
                continue
            # stage 2: condition this realization on its own samples and
            # draw the whole function — it passes through its x's
            ufi = exact.condition_update(
                rf, jnp.asarray(Zr), jnp.asarray(cond_pts),
                jnp.asarray(samples[i][:, None]), ls, os_,
                jnp.asarray(noise), 1e-10, False)
            mgi, cgi = exact.predict_update(
                jnp.asarray(grid), jnp.asarray(Zr), jnp.asarray(cond_pts),
                rf, ufi, ls, os_, 1e-10, False)
            key, sub = jax.random.split(key)
            eps = jax.random.normal(sub, (grid.shape[0],))
            draw = np.asarray(exact.posterior_sample(mgi, cgi, eps, 1e-8))
            ax.plot(grid[:, 0], draw, color=colors[i], lw=1.2)
            ax.plot(cond_pts[:, 0], samples[i], "x", color=colors[i],
                    ms=9, mew=2)

    axes[0].set_title("function-value samples at the SQP points")
    axes[1].set_title("realizations re-sampled after self-conditioning")
    axes[0].legend(loc="lower left", fontsize=8)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=200, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
