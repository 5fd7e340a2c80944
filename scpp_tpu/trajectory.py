"""Trajectory and discretization containers as stacked-array pytrees.

Reference semantics: scpp_core/include/trajectoryData.hpp:8-91 (X, U, t with
FOH-vs-ZOH encoded by ``U.size()==X.size()`` and linear time interpolation)
and discretizationData.hpp:8-78 (per-interval A, B, C, s, z with capability
flags encoded by emptiness of C/s).

TPU-native redesign: instead of vectors of small Eigen matrices we use
stacked arrays — ``X: (K, n)``, ``U: (n_U, m)``, ``A: (K-1, n, n)`` etc. —
so every per-node/per-interval operation is a batched array op, and the
FOH / free-final-time capability flags are *static* Python attributes
(shape-level facts), not runtime emptiness checks. Everything is
jit/vmap/shard_map friendly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

__all__ = ["TrajectoryData", "DiscretizationData"]


@struct.dataclass
class TrajectoryData:
    """States X:(K,n), inputs U:(K,m) [FOH] or (K-1,m) [ZOH], final time t.

    Mirrors trajectoryData.hpp:8-24. ``t`` is a scalar array so it can be a
    solver variable (free final time) and batch under vmap.
    """

    X: jnp.ndarray
    U: jnp.ndarray
    t: jnp.ndarray

    @property
    def n_X(self) -> int:
        return self.X.shape[-2]

    @property
    def n_U(self) -> int:
        return self.U.shape[-2]

    @property
    def interpolated_input(self) -> bool:
        # FOH iff one input per node (trajectoryData.hpp:35-38)
        return self.U.shape[-2] == self.X.shape[-2]

    def input_at_time(self, t):
        """Linear interpolation of u at time t (trajectoryData.hpp:41-58).

        ZOH holds u_i constant on interval i; FOH interpolates linearly.
        """
        K = self.n_X
        dt = self.t / (K - 1)
        t = jnp.clip(t, 0.0, self.t)
        i = jnp.clip(jnp.floor(t / dt).astype(jnp.int32), 0, K - 2)
        frac = t / dt - i
        u0 = self.U[i]
        u1 = self.U[jnp.minimum(i + 1, self.n_U - 1)] if self.interpolated_input else u0
        return u0 + frac * (u1 - u0)

    def state_at_time(self, t):
        """Linear interpolation of x at time t (trajectoryData.hpp:61-78)."""
        K = self.n_X
        dt = self.t / (K - 1)
        t = jnp.clip(t, 0.0, self.t)
        i = jnp.clip(jnp.floor(t / dt).astype(jnp.int32), 0, K - 2)
        frac = t / dt - i
        return self.X[i] + frac * (self.X[i + 1] - self.X[i])

    @staticmethod
    def zeros(K: int, state_dim: int, input_dim: int, interpolate_input: bool,
              dtype=jnp.float32) -> "TrajectoryData":
        """Blank trajectory (trajectoryData.hpp:27-32)."""
        n_U = K if interpolate_input else K - 1
        return TrajectoryData(
            X=jnp.zeros((K, state_dim), dtype),
            U=jnp.zeros((n_U, input_dim), dtype),
            t=jnp.zeros((), dtype),
        )


@struct.dataclass
class DiscretizationData:
    """Per-interval linearization x_{k+1} = A_k x_k + B_k u_k (+ C_k u_{k+1})
    (+ s_k sigma) + z_k.

    Mirrors discretizationData.hpp:8-65; ``C is None`` <=> ZOH,
    ``s is None`` <=> fixed final time — static facts, checked by shape.
    A: (K-1, n, n), B: (K-1, n, m), C: (K-1, n, m) | None,
    s: (K-1, n) | None, z: (K-1, n).
    """

    A: jnp.ndarray
    B: jnp.ndarray
    z: jnp.ndarray
    C: Optional[jnp.ndarray] = None
    s: Optional[jnp.ndarray] = None

    @property
    def interpolated_input(self) -> bool:
        return self.C is not None

    @property
    def variable_time(self) -> bool:
        return self.s is not None

    @staticmethod
    def zeros(K: int, state_dim: int, input_dim: int, interpolate_input: bool,
              free_final_time: bool, dtype=jnp.float32) -> "DiscretizationData":
        n, m = state_dim, input_dim
        return DiscretizationData(
            A=jnp.zeros((K - 1, n, n), dtype),
            B=jnp.zeros((K - 1, n, m), dtype),
            z=jnp.zeros((K - 1, n), dtype),
            C=jnp.zeros((K - 1, n, m), dtype) if interpolate_input else None,
            s=jnp.zeros((K - 1, n), dtype) if free_final_time else None,
        )
