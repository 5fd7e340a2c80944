"""scpp_tpu — a TPU-native successive-convexification trajectory optimization framework.

A from-scratch JAX/XLA re-design of the capabilities of the SCpp C++ library
(successive convexification, SCvx trust-region, SOCP MPC, LQR) built for TPU:

- dynamics and Jacobians via ``jax.jacfwd`` over pure flow maps (replacing
  CppAD/CppADCodegen JIT C codegen),
- multiple-shooting discretization as a ``vmap``-batched ``lax.scan`` RK
  integration of the variational system,
- an on-device batched first-order conic (SOCP) solver with per-cone
  projections (replacing Epigraph -> ECOS),
- whole solver loops staged under ``jit`` so batched scenario solves never
  leave the chip; scenario parallelism over device meshes via ``shard_map``.

Reference behavior parity targets are cited per-module against
``EmbersArc/SCpp`` as ``<file>:<line>``.
"""

__version__ = "0.1.0"

from scpp_tpu.trajectory import TrajectoryData, DiscretizationData  # noqa: F401
