"""Nonlinear closed-loop propagation.

Parity with scpp::simulate (scpp_core/src/simulation.cpp:31-42): integrate
the flow map over one control interval with linearly interpolated input
(ZOH callers pass u1 == u0). Adaptive RKF78 is replaced by fixed-step
dopri5 (see ops/integrators.py); `substeps` is calibrated in tests against
scipy DOP853 reference solutions.
"""

from __future__ import annotations

__all__ = ["simulate"]

from scpp_tpu.ops.integrators import integrate_fixed


def simulate(model, par, dt, u0, u1, x, substeps: int = 12, method: str = "dopri5"):
    """Propagate state x over [0, dt] under input u(t) = u0 + t/dt (u1-u0)."""

    def f(y, t):
        u = u0 + (t / dt) * (u1 - u0)
        return model.flow_map(y, u, par)

    return integrate_fixed(f, x, 0.0, dt, substeps, method)
