import os

import numpy as np
import pytest

from scpp_tpu.utils.info_parser import InfoFile, parse_info

SAMPLE = """
; a comment
final_time      12.      ; trailing comment
K               25
nondimensionalize  true

g_I
{
    (0)   0.0
    (1)   -9.81 ; m/s2
}

weights
{
    scaling 0.1
    (0)   1.
    (1)   2.
}

M
{
    (0,0) 1.
    (0,1) 2.
    (1,0) 3.
    (1,1) 4.
}
"""


def test_scalars():
    f = InfoFile(SAMPLE, is_path=False)
    assert f.load_scalar("final_time") == 12.0
    assert f.load_scalar("K", int) == 25
    assert f.load_scalar("nondimensionalize", bool) is True


def test_vector_with_scaling():
    f = InfoFile(SAMPLE, is_path=False)
    np.testing.assert_allclose(f.load_vector("g_I", 2), [0.0, -9.81])
    np.testing.assert_allclose(f.load_vector("weights", 2), [0.1, 0.2])


def test_matrix():
    f = InfoFile(SAMPLE, is_path=False)
    np.testing.assert_allclose(f.load_matrix("M", (2, 2)), [[1, 2], [3, 4]])


def test_missing_and_redundant_entries_raise():
    f = InfoFile("v\n{\n (0) 1.\n}\n", is_path=False)
    with pytest.raises(ValueError):
        f.load_vector("v", 2)
    with pytest.raises(ValueError):
        f.load_vector("v", 0)
    with pytest.raises(KeyError):
        f.load_scalar("absent")


def test_reference_config_files_ingest():
    """Stock SCpp config files parse verbatim (format compatibility)."""
    import os
    ref = "/root/reference/scpp_models/config"
    if not os.path.isdir(ref):
        pytest.skip("reference configs not present")
    f = InfoFile(os.path.join(ref, "Rocket2D", "model.info"))
    assert f.load_scalar("m") == 24000.0
    np.testing.assert_allclose(f.load_vector("g_I", 2), [0.0, -9.81])
    assert f.load_scalar("constrain_initial_final", bool) is True
    f = InfoFile(os.path.join(ref, "RocketQuat", "SCvx.info"))
    assert f.load_scalar("K", int) == 30
    assert f.load_scalar("trust_region") == 5.0


def test_nested_parse():
    tree = parse_info("a { b { c 1 } d 2 }\n")
    assert tree == {"a": {"b": {"c": "1"}, "d": "2"}}


# ---- model.info physics ingestion (rocket2d.cpp:150-195, rocketQuat.cpp:234-289)

REF_CFG = "/root/reference/scpp_models/config"


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference absent")
def test_rocket2d_model_info_matches_defaults():
    """The stock Rocket2D model.info must reproduce default_params exactly
    (the defaults were transcribed from that file)."""
    from scpp_tpu.models import Rocket2D
    p_file = Rocket2D.from_info(os.path.join(REF_CFG, "Rocket2D/model.info"))
    p_def = Rocket2D.default_params()
    for name in ("m", "J_B", "g_I", "r_T_B", "T_min", "T_max", "gamma_gs",
                 "gimbal_max", "theta_max", "w_B_max", "x_init", "x_final",
                 "final_time"):
        np.testing.assert_allclose(np.asarray(getattr(p_file, name)),
                                   np.asarray(getattr(p_def, name)),
                                   rtol=1e-12, err_msg=name)
    assert p_file.constrain_initial_final is True


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference absent")
def test_rocketquat_model_info_matches_defaults():
    from scpp_tpu.models import RocketQuat
    p_file = RocketQuat.from_info(
        os.path.join(REF_CFG, "RocketQuat/model.info"))
    p_def = RocketQuat.default_params()
    for name in ("alpha_m", "J_B", "g_I", "r_T_B", "T_min", "T_max", "t_max",
                 "gamma_gs", "gimbal_max", "theta_max", "w_B_max", "x_init",
                 "x_final", "final_time"):
        np.testing.assert_allclose(np.asarray(getattr(p_file, name)),
                                   np.asarray(getattr(p_def, name)),
                                   rtol=1e-12, err_msg=name)
    assert p_file.exact_minimum_thrust is True
    assert p_file.enable_roll_control is False


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference absent")
def test_rocketeuler_model_info_ingests_quat_config():
    """RocketEuler consumes the RocketQuat file with rpy kept as Euler."""
    from scpp_tpu.models import RocketEuler
    p = RocketEuler.from_info(os.path.join(REF_CFG, "RocketQuat/model.info"))
    np.testing.assert_allclose(np.asarray(p.x_init[7:10]),
                               np.deg2rad([-20.0, 20.0, 0.0]), rtol=1e-12)
    assert p.x_init.shape == (13,)


def test_model_info_overrides():
    from scpp_tpu.models import Rocket2D
    path = os.path.join(REF_CFG, "Rocket2D/model.info")
    if not os.path.exists(path):
        pytest.skip("reference absent")
    p = Rocket2D.from_info(path, constrain_initial_final=False)
    assert p.constrain_initial_final is False


def test_starship_preset_ingests_and_flies():
    """The Starship-class preset (the commented-out block at the top of
    the reference's RocketQuat model.info, activated as
    configs/presets/RocketQuat_Starship/model.info) loads through
    from_info and produces a well-posed problem: sane physics, finite
    dynamics, and a first staged SCvx subproblem that solves tightly."""
    import jax.numpy as jnp

    from scpp_tpu.algos.staged_problems import build_scvx_subproblem_staged
    from scpp_tpu.models import RocketQuat
    from scpp_tpu.ops.discretization import multiple_shooting
    from scpp_tpu.solver.ipm import IPMSettings
    from scpp_tpu.solver.ipm_staged import solve_staged_ipm

    path = os.path.join(os.path.dirname(__file__),
                        "../scpp_tpu/configs/presets/RocketQuat_Starship/"
                        "model.info")
    params = RocketQuat.from_info(path)
    assert float(params.x_init[0]) == 140000.0        # m_init
    assert float(params.x_final[0]) == 120000.0       # m_dry
    assert float(params.T_max) == 3000000.0
    assert bool(params.exact_minimum_thrust)
    assert not bool(params.enable_roll_control)

    p = RocketQuat.nondimensionalize(params)
    par = RocketQuat.param_vector(p)
    td = RocketQuat.init_trajectory(p, 15, True)
    assert bool(jnp.all(jnp.isfinite(td.X)))
    xdot = RocketQuat.flow_map(td.X[0], td.U[0], par)
    assert bool(jnp.all(jnp.isfinite(xdot)))

    ref = RocketQuat.constraint_ref(p, td)
    dd = multiple_shooting(RocketQuat, par, td, substeps=6,
                           variable_time=False)
    prog = build_scvx_subproblem_staged(
        RocketQuat, p, td, dd, jnp.asarray(5.0, td.X.dtype),
        jnp.asarray(1e3, td.X.dtype), ref, None)
    res = solve_staged_ipm(prog, IPMSettings(iters=30, eps_feas=1e-6))
    assert float(res.res_pri) < 1e-6
    assert float(res.res_dua) < 1e-6
    assert float(res.res_gap) < 1e-4
