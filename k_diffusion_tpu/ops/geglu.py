"""GEGLU activation (reference image_transformer_v2.py:90-95)."""

import jax
import jax.numpy as jnp


def linear_geglu(x, weight, bias=None):
    """x @ weight -> split halves -> a * gelu(b). ``weight`` has shape
    (in_features, out_features * 2); XLA fuses the gate elementwise chain
    into the matmul epilogue on the MXU."""
    x = x @ weight
    if bias is not None:
        x = x + bias
    a, gate = jnp.split(x, 2, axis=-1)
    return a * jax.nn.gelu(gate, approximate=False)
