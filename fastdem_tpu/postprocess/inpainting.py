"""Iterative NaN-hole inpainting by neighbor averaging.

Equivalent of applyInpainting (/root/reference/fastdem/src/inpainting.cpp:21-67):
per iteration, NaN cells with >= min_valid finite 8-neighbors receive the
mean of those neighbors (double-buffered: all reads see the previous
iteration); iteration stops early when nothing changed or after
max_iterations. Expressed as a lax.while_loop over one fused stencil pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastdem_tpu.postprocess.stencil import square_offsets, window_stack


def inpaint(
    elevation: jnp.ndarray,
    max_iterations: int = 3,
    min_valid_neighbors: int = 2,
) -> jnp.ndarray:
    """Fill NaN holes; returns the inpainted layer."""
    offsets = square_offsets(3, include_center=False)

    def one_pass(a):
        win = window_stack(a, offsets)
        finite = jnp.isfinite(win)
        cnt = jnp.sum(finite, axis=0)
        s = jnp.sum(jnp.where(finite, win, 0.0), axis=0)
        fill = (jnp.isnan(a)) & (cnt >= min_valid_neighbors)
        mean = s / jnp.maximum(cnt, 1)
        out = jnp.where(fill, mean, a)
        return out, jnp.any(fill)

    def cond(carry):
        a, i, changed = carry
        return (i < max_iterations) & changed

    def body(carry):
        a, i, _ = carry
        out, changed = one_pass(a)
        return out, i + 1, changed

    out, _, _ = jax.lax.while_loop(
        cond, body, (elevation, jnp.int32(0), jnp.bool_(True))
    )
    return out


def apply_inpainting(geom, state, cfg, inplace: bool = True):
    """Map-level wrapper mirroring applyInpainting's in-place /
    'elevation_inpainted' split (inpainting.cpp:23-32)."""
    from fastdem_tpu.grid.gridmap import layers

    out = inpaint(
        state.layers[layers.elevation], cfg.max_iterations, cfg.min_valid_neighbors
    )
    target = layers.elevation if inplace else layers.elevation_inpainted
    return state.replace_layer(target, out)
