"""Bilateral uncertainty fusion via weighted windowed ECDF quantiles.

Equivalent of applyUncertaintyFusion
(/root/reference/fastdem/src/uncertainty_fusion.cpp:103-186): for every cell
with finite bounds, neighbors within search_radius contribute their
(lower, upper) bounds weighted by Gaussian distance decay times the inverse
bound range 1/(upper - lower + 1e-4); the fused bounds are the weighted
quantiles (quantile_lower of the lowers, quantile_upper of the uppers),
applied when >= min_valid_neighbors contribute.

The reference's per-cell sort-based SimpleWeightedECDF (:36-99, including
its 'weight <= 1e-6 is skipped' rule and the cumulative >= p * total stop)
becomes one argsort along the window axis for all cells at once: the window
is small (9..49 entries for configured radii), so this is a handful of
fused vector passes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fastdem_tpu.config.config import UncertaintyFusionConfig
from fastdem_tpu.postprocess.stencil import (
    disk_offsets,
    offset_distances_sq,
    window_stack,
)


def _weighted_quantile(values, weights, p):
    """Per-cell weighted quantile over window axis 0.

    values/weights: [K, H, W]; invalid entries must have weight 0 (they are
    sorted to +inf tail). Returns [H, W] (NaN where total weight is 0).
    Matches SimpleWeightedECDF::quantile (:61-91): sort by value, return the
    first value whose cumulative weight reaches p * total.
    """
    order = jnp.argsort(jnp.where(weights > 0.0, values, jnp.inf), axis=0)
    v_sorted = jnp.take_along_axis(values, order, axis=0)
    w_sorted = jnp.take_along_axis(weights, order, axis=0)
    cum = jnp.cumsum(w_sorted, axis=0)
    total = cum[-1]
    target = p * total
    reached = cum >= target
    # First index where cumulative >= target.
    idx = jnp.argmax(reached, axis=0).astype(jnp.int32)
    out = jnp.take_along_axis(v_sorted, idx[None], axis=0)[0]
    return jnp.where(total > 0.0, out, jnp.nan)


def fuse_bounds(
    upper: jnp.ndarray,
    lower: jnp.ndarray,
    cfg: UncertaintyFusionConfig,
    resolution: float,
):
    """Returns (fused_upper, fused_lower)."""
    offsets = disk_offsets(cfg.search_radius, resolution)
    d2 = offset_distances_sq(offsets, resolution)  # [K]
    inv_2s2 = 1.0 / (2.0 * cfg.spatial_sigma * cfg.spatial_sigma)
    w_spatial = jnp.asarray(np.exp(-d2 * inv_2s2), dtype=jnp.float32)

    up_win = window_stack(upper, offsets)  # [K, H, W]
    lo_win = window_stack(lower, offsets)
    valid = jnp.isfinite(up_win) & jnp.isfinite(lo_win)
    rng = up_win - lo_win
    w = w_spatial[:, None, None] / (rng + 1e-4)
    # ECDF::add skips weight <= 1e-6 and non-finite values (:40-44).
    w = jnp.where(valid & (w > 1e-6), w, 0.0)

    count = jnp.sum(valid, axis=0)
    fused_lo = _weighted_quantile(lo_win, w, cfg.quantile_lower)
    fused_up = _weighted_quantile(up_win, w, cfg.quantile_upper)

    # Center must have finite bounds; enough neighbors; fused must be finite.
    center_ok = jnp.isfinite(upper) & jnp.isfinite(lower)
    apply = (
        center_ok
        & (count >= cfg.min_valid_neighbors)
        & jnp.isfinite(fused_lo)
        & jnp.isfinite(fused_up)
    )
    return (
        jnp.where(apply, fused_up, upper),
        jnp.where(apply, fused_lo, lower),
    )


def apply_uncertainty_fusion(geom, state, cfg: UncertaintyFusionConfig):
    from fastdem_tpu.grid.gridmap import layers

    if not cfg.enabled:
        return state
    up, lo = fuse_bounds(
        state.layers[layers.upper_bound],
        state.layers[layers.lower_bound],
        cfg,
        geom.resolution,
    )
    return state.replace_layers(
        {layers.upper_bound: up, layers.lower_bound: lo}
    )
