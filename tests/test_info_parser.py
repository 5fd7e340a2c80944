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
