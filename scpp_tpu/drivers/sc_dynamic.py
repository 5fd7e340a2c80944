"""Library-call API: one SC solve returning the trajectory.

Parity with scpp/src/sc_dynamic.cpp:3-15 (`sc_dynamic(model) ->
trajectory_data_t`): the one-call entry point for embedding the solver.
"""

from __future__ import annotations

from scpp_tpu.algos.sc import solve_sc
from scpp_tpu.configs.algorithms import SCConfig
from scpp_tpu.trajectory import TrajectoryData

__all__ = ["sc_dynamic"]


def sc_dynamic(model, params, cfg: SCConfig = SCConfig(),
               warm_td: TrajectoryData = None) -> TrajectoryData:
    """Solve and return the final trajectory (sc_dynamic.cpp:3-15)."""
    return solve_sc(model, params, cfg, warm_td).td
