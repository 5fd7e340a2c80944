from scpp_tpu.models.rocket2d import Rocket2D, Rocket2DParams  # noqa: F401
from scpp_tpu.models.rocket_quat import RocketQuat, RocketQuatParams  # noqa: F401
from scpp_tpu.models.rocket_euler import RocketEuler, RocketEulerParams  # noqa: F401

MODEL_REGISTRY = {
    Rocket2D.name: Rocket2D,
    RocketQuat.name: RocketQuat,
    RocketEuler.name: RocketEuler,
}
