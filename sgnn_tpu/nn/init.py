"""Parameter initializers (He-style, matching the originals' conventions)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def subm_conv_init(key, filter_volume: int, cin: int, cout: int) -> jax.Array:
    """SparseConvNet convolution init: N(0, sqrt(2 / (fan_in)))."""
    std = (2.0 / (filter_volume * cin)) ** 0.5
    return std * jax.random.normal(key, (filter_volume, cin, cout), jnp.float32)


def conv3d_init(key, cout: int, cin: int, k: int) -> jax.Array:
    """Torch Conv3d default (kaiming uniform, a=sqrt(5)) ~ U(±1/sqrt(fan_in))."""
    fan_in = cin * k ** 3
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(
        key, (cout, cin, k, k, k), jnp.float32, -bound, bound
    )


def conv_transpose3d_init(key, cin: int, cout: int, k: int) -> jax.Array:
    fan_in = cin * k ** 3
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(
        key, (cin, cout, k, k, k), jnp.float32, -bound, bound
    )


def linear_init(key, cin: int, cout: int) -> dict:
    """Torch nn.Linear default: W,b ~ U(±1/sqrt(cin)). Stored as [cin, cout]."""
    kw, kb = jax.random.split(key)
    bound = (1.0 / cin) ** 0.5
    return {
        "weight": jax.random.uniform(kw, (cin, cout), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }
