"""Dense per-cell 1D Kalman + Welford estimator update.

Vectorized equivalent of the reference per-cell scalar filter
(/root/reference/fastdem/include/fastdem/mapping/kalman_estimation.hpp:98-153):
one masked elementwise pass over the whole grid per scan instead of a loop
over touched cells. Exact same recurrences:

  R = measurement_variance if > 0 else max_variance   (:112-113; NaN -> R_max)
  first obs:  x = z, P = R, count = 1                  (:116-119)
  update:     P += Q; K = P/(P+R); x += K (z - x);
              P = clamp((1-K) P, min_var, max_var); count += 1  (:121-127)
  Welford:    mean/m2/sample_var with count shared with the filter (:129-141)
  bounds:     x +/- 2 sqrt(max(0, sample_var))         (:145-153)

Layers created/consumed (ensure_layers mirrors :64-82).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from fastdem_tpu.config.config import KalmanConfig
from fastdem_tpu.grid.gridmap import GridMapState, layers


def layer_fills() -> Dict[str, float]:
    """Initial fills for Kalman estimator layers (kalman_estimation.hpp:64-82)."""
    return {
        layers.variance: 0.0,
        layers.n_points: 0.0,
        layers.kalman_p: 0.0,
        layers.sample_mean: np.nan,
        layers.sample_m2: 0.0,
        layers.upper_bound: np.nan,
        layers.lower_bound: np.nan,
    }


def update(
    state: GridMapState,
    cfg: KalmanConfig,
    z: jnp.ndarray,
    z_var: jnp.ndarray,
    touched: jnp.ndarray,
) -> GridMapState:
    """One scan's estimator update. ``z``/``z_var`` are dense [H, W] per-cell
    observations (NaN where untouched), ``touched`` the update mask."""
    x = state.layers[layers.elevation]
    P = state.layers[layers.kalman_p]
    count = state.layers[layers.n_points]
    mean = state.layers[layers.sample_mean]
    m2 = state.layers[layers.sample_m2]
    svar = state.layers[layers.variance]

    R = jnp.where(z_var > 0.0, z_var, cfg.max_variance)

    is_new = jnp.isnan(x)
    # Update branch
    P_pred = P + cfg.process_noise
    K = P_pred / (P_pred + R)
    x_upd = x + K * (z - x)
    P_upd = jnp.clip((1.0 - K) * P_pred, cfg.min_variance, cfg.max_variance)
    cnt_upd = count + 1.0

    new_x = jnp.where(is_new, z, x_upd)
    new_P = jnp.where(is_new, R, P_upd)
    new_cnt = jnp.where(is_new, 1.0, cnt_upd)

    # Welford (uses the already-incremented count, :136)
    mean_new = jnp.isnan(mean)
    delta = z - mean
    w_mean = mean + delta / new_cnt
    delta2 = z - w_mean
    w_m2 = m2 + delta * delta2
    w_var = jnp.where(new_cnt > 1.0, w_m2 / jnp.maximum(new_cnt - 1.0, 1.0), 0.0)

    out_mean = jnp.where(mean_new, z, w_mean)
    out_m2 = jnp.where(mean_new, 0.0, w_m2)
    out_var = jnp.where(mean_new, 0.0, w_var)

    # Bounds recomputed only for touched cells (estimate() calls
    # computeBounds per updated cell, src/elevation_mapping.cpp:103-104).
    sigma = jnp.sqrt(jnp.maximum(0.0, jnp.where(touched, out_var, svar)))
    upper = jnp.where(touched, new_x, x) + 2.0 * sigma
    lower = jnp.where(touched, new_x, x) - 2.0 * sigma

    def sel(new, old):
        return jnp.where(touched, new, old)

    return state.replace_layers(
        {
            layers.elevation: sel(new_x, x),
            layers.kalman_p: sel(new_P, P),
            layers.n_points: sel(new_cnt, count),
            layers.sample_mean: sel(out_mean, mean),
            layers.sample_m2: sel(out_m2, m2),
            layers.variance: sel(out_var, svar),
            layers.upper_bound: sel(upper, state.layers[layers.upper_bound]),
            layers.lower_bound: sel(lower, state.layers[layers.lower_bound]),
        }
    )
