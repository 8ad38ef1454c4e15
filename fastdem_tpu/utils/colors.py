"""Packed-float RGB helpers (nanogrid colorVectorToValue/colorValueToVector).

grid_map/nanoGrid packs an RGB triple into the bit pattern of a float32:
value = bitcast(r << 16 | g << 8 | b). Used by the color layer
(/root/reference/fastdem/src/elevation_mapping.cpp:85-86,
/root/reference/fastdem/src/pcd_convert.cpp:363).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_rgb(rgb: jnp.ndarray) -> jnp.ndarray:
    """u8[..., 3] -> f32[...] bit-packed color value."""
    rgb = jnp.asarray(rgb)
    r = rgb[..., 0].astype(jnp.uint32)
    g = rgb[..., 1].astype(jnp.uint32)
    b = rgb[..., 2].astype(jnp.uint32)
    bits = (r << 16) | (g << 8) | b
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def unpack_rgb(value: jnp.ndarray) -> jnp.ndarray:
    """f32[...] -> u8[..., 3]."""
    bits = jax.lax.bitcast_convert_type(
        jnp.asarray(value, dtype=jnp.float32), jnp.uint32
    )
    r = (bits >> 16) & 0xFF
    g = (bits >> 8) & 0xFF
    b = bits & 0xFF
    return jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)
