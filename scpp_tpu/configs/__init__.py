from scpp_tpu.configs.algorithms import (  # noqa: F401
    SCConfig, SCvxConfig, MPCConfig, LQRConfig,
)
