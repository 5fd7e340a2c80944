"""Model protocol: a model is a namespace of pure functions + a params pytree.

TPU-native redesign of the reference's CRTP SystemModel / SystemDynamics
stack (scpp_core/include/systemModel.hpp:13-159,
systemDynamics.hpp:53-235): instead of a CppAD tape JIT-compiled to C via
gcc+dlopen, dynamics are a pure ``flow_map(x, u, par)`` and Jacobians are
``jax.jacfwd`` — XLA is the JIT. There is no ``initializeModel()`` step and
no mutable "dynamic parameter" state: parameters are ordinary traced
arguments, so scenario dispersions batch with vmap.

A model class provides (all staticmethods, class used as a namespace):
  - state_dim / input_dim / param_dim / name
  - flow_map(x, u, par) -> xdot                  [systemDynamics.hpp:95]
  - param_vector(params) -> par                  [getNewModelParameters]
  - init_trajectory(params, K, foh) -> TrajectoryData
  - constraints(builder, vX, vU, params, ref)    [addApplicationConstraints]
  - constraint_ref(params, td) -> ref pytree     [updateProblemParameters]
  - nondimensionalize(params) / redimensionalize(params)
  - scale_trajectory(params, td) / unscale_trajectory(params, td)
  - operating_point(params) -> (x_eq, u_eq)      [getOperatingPoint]
"""

from __future__ import annotations

import jax

__all__ = ["jacobians", "flow_with_jacobians"]


def jacobians(model, x, u, par):
    """A = df/dx, B = df/du at (x, u) (systemDynamics.hpp:205-235).

    Forward-mode: state+input dims are small (<= 18), so jacfwd needs only
    n+m dual passes and fuses into the surrounding computation under jit.
    """
    A = jax.jacfwd(model.flow_map, argnums=0)(x, u, par)
    B = jax.jacfwd(model.flow_map, argnums=1)(x, u, par)
    return A, B


def flow_with_jacobians(model, x, u, par):
    """f, A, B in one evaluation."""
    f = model.flow_map(x, u, par)
    A, B = jacobians(model, x, u, par)
    return f, A, B
