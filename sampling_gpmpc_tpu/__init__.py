"""sampling_gpmpc_tpu — TPU-native sampling-based GP-MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``manish-pra/sampling-gpmpc`` (arXiv:2505.07594 / arXiv:2409.08616):

* exact Gaussian processes with derivative observations, batched over
  ``(num_dyn_samples, g_ny)``, with iterative ("hallucinated") conditioning
  implemented as static-shape masked buffers (ref: src/agent.py:164-272),
* posterior *function* sampling via Cholesky pathwise sampling with fixed
  epistemic base draws (ref: src/agent.py:629-730),
* an augmented-state SQP-RTI optimal control problem over all dynamics
  samples, solved by per-sample condensing onto the shared input plus a
  dense primal-dual interior-point QP (replacing acados/HPIPM,
  ref: src/solver.py, src/utils/ocp.py),
* multi-chip scaling by sharding the sample axis over a
  ``jax.sharding.Mesh`` and psum-reducing the condensed QP contributions
  (replacing the reference's single-GPU batching + SLURM scale-out).

Layout:
    config.py     — reference-compatible YAML experiment configs
    envs/         — dynamics model families (pendulum, pendulum1D, car, car residual)
    gp/           — derivative-RBF kernels + batched exact conditioning + sampling
    ocp/          — OCP spec, condensing, dense QP, SQP-RTI loop
    agent.py      — sampling engine (epistemic draws, GP state, jacobian assembly)
    dempc.py      — closed-loop receding-horizon driver
    parallel/     — mesh/sharding helpers, ns-sharded solver path
    recorder.py   — artifact recording (data.pkl-compatible)
"""

from sampling_gpmpc_tpu.setup import enable_x64, default_dtype

__version__ = "0.1.0"
