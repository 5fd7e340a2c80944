"""Fixed-step Runge-Kutta integrators as ``lax.scan`` loops.

TPU-native replacement for the reference's adaptive Boost.odeint RKF78
(discretizationImplementation.hpp:140-154, simulation.cpp:36-41): adaptive
stepping is data-dependent control flow that XLA cannot batch, so we use
fixed-step high-order RK with enough substeps to hit the reference
tolerance (validated against scipy DOP853 in tests), which keeps every
(scenario x interval) integration in lockstep for vmap/MXU batching.

State may be any pytree (the discretization integrates a tuple-of-matrices
variational state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rk_step", "integrate_fixed", "TABLEAUS"]

_tree = jax.tree_util


def _axpy(y, scale_terms):
    """y + sum_i a_i * k_i over pytrees; scale_terms = [(a_i, k_i), ...]."""
    def combine(y_leaf, *k_leaves):
        out = y_leaf
        for (a, _), k in zip(scale_terms, k_leaves):
            out = out + a * k
        return out
    return _tree.tree_map(combine, y, *[k for _, k in scale_terms])


# Butcher tableaus: (c nodes, a lower-triangular rows, b weights)
_RK4 = (
    np.array([0.0, 0.5, 0.5, 1.0]),
    [np.array([]),
     np.array([0.5]),
     np.array([0.0, 0.5]),
     np.array([0.0, 0.0, 1.0])],
    np.array([1 / 6, 1 / 3, 1 / 3, 1 / 6]),
)

# Dormand-Prince 5(4), 5th-order weights (FSAL stage kept explicit)
_DOPRI5 = (
    np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0]),
    [np.array([]),
     np.array([1 / 5]),
     np.array([3 / 40, 9 / 40]),
     np.array([44 / 45, -56 / 15, 32 / 9]),
     np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
     np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
     np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84])],
    np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]),
)

TABLEAUS = {"rk4": _RK4, "dopri5": _DOPRI5}


def rk_step(f, y, t, h, method: str = "dopri5"):
    """One explicit RK step of size h for y' = f(y, t).

    Tableau coefficients are unwrapped to weak Python floats so the state
    dtype governs: a strong np.float64 scalar would silently promote a
    float32 integration to f64 when x64 is enabled (the mixed-precision
    accuracy lane runs fp32 data in an x64-enabled process)."""
    c, a_rows, b = TABLEAUS[method]
    ks = []
    for i in range(len(c)):
        yi = _axpy(y, [(h * float(a_rows[i][j]), ks[j])
                       for j in range(i)]) if i else y
        ks.append(f(yi, t + float(c[i]) * h))
    return _axpy(y, [(h * float(b[i]), ks[i])
                     for i in range(len(ks)) if b[i] != 0.0])


def integrate_fixed(f, y0, t0, t1, steps: int, method: str = "dopri5"):
    """Integrate y' = f(y, t) from t0 to t1 in ``steps`` fixed RK steps.

    fori_loop rather than a scan over arange: identical numerics and XLA
    code, but Mosaic's scan lowering rejects extensive (xs) inputs, and
    this loop runs inside the fused dynamics kernels (ops/disc_mono.py).
    """
    h = (t1 - t0) / steps

    def body(i, y):
        t = t0 + i * h
        return rk_step(f, y, t, h, method)

    return jax.lax.fori_loop(0, steps, body, y0)
