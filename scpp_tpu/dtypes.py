"""Floating-point policy.

On CPU (tests, golden comparisons) we enable x64 and run everything in
float64. On TPU the default is float32 with HIGHEST-precision matmuls for
the conic solver's linear algebra (fp32 MXU passes instead of bf16).
"""

import jax
import jax.numpy as jnp

__all__ = ["default_float", "asdefault", "HIGHEST"]

HIGHEST = jax.lax.Precision.HIGHEST


def default_float():
    """float64 when jax x64 is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def asdefault(x):
    """Convert an array-like to the default float dtype."""
    return jnp.asarray(x, dtype=default_float())
