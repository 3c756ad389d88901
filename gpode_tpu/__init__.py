"""gpode_tpu — a TPU-native framework for Bayesian ODEs with Gaussian processes.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`hegdepashupati/gaussian-process-odes` (arXiv:2106.10905): learning unknown ODE
vector fields as sparse variational GP posteriors, integrating them with
jit-compiled ODE solvers, and training by maximizing an ELBO — either the
"vanilla" whole-trajectory variant or the multiple-shooting variant in which
all trajectory segments integrate in parallel on-chip.

Design stance (TPU-first, not a port):
  * Functional parameter pytrees + bijectors instead of Param/transform
    object graphs (reference: src/misc/param.py, src/misc/transforms.py).
  * One XLA program per training step: PRNG split -> RFF + inducing sample ->
    Kmm -> Cholesky -> whitened solves -> integrate -> ELBO -> grad -> Adam.
  * `lax.scan` / bounded-step adaptive stepping instead of Python-loop solvers
    (reference used torchdiffeq).
  * `vmap` over Monte-Carlo function draws and shooting segments; `jax.sharding`
    meshes for multi-chip data/segment/sample parallelism.

Public API entry points:
  * `gpode_tpu.train.builders` — build_gpode / build_shooting / ModelArgs /
    loss builders
  * `gpode_tpu.models` — gp (SVGP core), gpode, shooting, neural_ode, states,
    likelihoods, constraints, flow, init
  * `gpode_tpu.ops` — math, kernels, ode, adjoint, pallas_kernels
  * `gpode_tpu.train` — trainer, metrics, experiments
  * `gpode_tpu.parallel` — mesh, train (GSPMD), shard_map_step (explicit)
"""

__version__ = "0.1.0"
