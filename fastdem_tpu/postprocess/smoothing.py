"""Median spatial smoothing of a map layer.

Equivalent of applySpatialSmoothing
(/root/reference/fastdem/include/fastdem/postprocess/spatial_smoothing.hpp:38-67):
each finite cell with >= min_valid finite neighbors in its k x k window is
replaced by the window median (nth_element with mid = count/2, i.e. the
upper median). Vectorized: NaNs sort to +inf, a per-cell dynamic index picks
element count//2 of the sorted window.
"""

from __future__ import annotations

import jax.numpy as jnp

from fastdem_tpu.postprocess.stencil import square_offsets, window_stack


def smooth_median(
    layer: jnp.ndarray, kernel_size: int = 3, min_valid_neighbors: int = 5
) -> jnp.ndarray:
    offsets = square_offsets(kernel_size, include_center=True)
    win = window_stack(layer, offsets)  # [K, H, W]
    finite = jnp.isfinite(win)
    cnt = jnp.sum(finite, axis=0)
    sorted_vals = jnp.sort(jnp.where(finite, win, jnp.inf), axis=0)
    mid = (cnt // 2).astype(jnp.int32)
    median = jnp.take_along_axis(sorted_vals, mid[None], axis=0)[0]
    ok = jnp.isfinite(layer) & (cnt >= min_valid_neighbors)
    return jnp.where(ok, median, layer)


def apply_spatial_smoothing(
    state, layer_name: str, kernel_size: int = 3, min_valid_neighbors: int = 5
):
    if layer_name not in state.layers:
        return state
    return state.replace_layer(
        layer_name,
        smooth_median(state.layers[layer_name], kernel_size, min_valid_neighbors),
    )
