"""Ghost-obstacle removal via log-odds visibility (data-parallel raycast).

TPU-native reformulation of the reference DDA raycaster
(/root/reference/fastdem/src/raycasting.cpp):
  * processScan (:150-179): per scan point inside the map, visibility
    log-odds += log_odds_observed, clamped at log_odds_max. Sequential
    clamped addition of a positive constant equals scatter-add then clamp,
    so the whole pass is one scatter.
  * traceRay DDA (:46-139): the sequential per-ray grid walk that records
    the minimum ray height per traversed cell is replaced by parametric
    sampling: each sensor->point segment is clipped to the map rectangle
    (Liang-Barsky) and sampled at a fixed per-ray count with spacing
    <= half a cell in the worst case; sampled (cell, height) pairs are
    scatter-min reduced. The reference records the height at each cell's
    EXIT (= the in-cell minimum for downward rays, :116-117); sampling
    approaches that within |dz| * dt. Rays are effectively one more point
    cloud rasterized with a min reduction — the same kernel shape as the
    mapping hot path.
  * resolveGhostCells (:188-214): cells traversed by rays whose recorded
    elevation sits above the minimum ray height by more than
    height_conflict_threshold lose log_odds_ghost; below clear_threshold
    the cell is cleared in every layer and marked in ghost_removal.

Precondition parity (applyRaycasting :218-249): no-op when the sensor origin
is outside the map (a traced predicate here, folded into the update masks)
or when the scan is empty. The per-frame 'raycasting' (min ray height) layer
is reset each call.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdem_tpu.config.config import RaycastingConfig
from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.grid.gridmap import GridMapState, layers

_INF = jnp.inf


def layer_fills() -> Dict[str, float]:
    """Raycasting layers (postprocess/raycasting.hpp:26-30); created at init
    since the layer set is static under jit."""
    return {
        layers.ghost_removal: np.nan,
        layers.raycasting: np.nan,
        layers.visibility_logodds: np.nan,
    }


def default_num_samples(geom: GridGeometry) -> int:
    """Worst-case <= half-cell spacing for a map-diagonal ray."""
    return 2 * (geom.rows + geom.cols)


def _clip_to_map(
    geom: GridGeometry,
    position: jnp.ndarray,
    origin: jnp.ndarray,
    ends: jnp.ndarray,
):
    """Liang-Barsky clip of segments origin->ends[i] against the map rect.
    Returns t_exit in [0, 1] per ray (origin assumed inside; exit clamped
    to the endpoint like the DDA's t >= 1 break, raycasting.cpp:129-136)."""
    half_x = 0.5 * geom.rows * geom.resolution
    half_y = 0.5 * geom.cols * geom.resolution
    lo = jnp.stack([position[0] - half_x, position[1] - half_y])
    hi = jnp.stack([position[0] + half_x, position[1] + half_y])
    d = ends[:, :2] - origin[:2]
    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t_lo = (lo - origin[:2]) / safe_d
    t_hi = (hi - origin[:2]) / safe_d
    t_max_axis = jnp.maximum(t_lo, t_hi)  # exit t per axis
    t_exit = jnp.min(t_max_axis, axis=1)
    return jnp.clip(t_exit, 0.0, 1.0)


def apply_raycasting(
    geom: GridGeometry,
    state: GridMapState,
    xyz: jnp.ndarray,
    scan_mask: jnp.ndarray,
    sensor_origin: jnp.ndarray,
    cfg: RaycastingConfig,
    num_samples: int | None = None,
) -> GridMapState:
    """Apply one scan's visibility update. ``xyz``/``scan_mask`` is the
    voxel-downsampled world-frame scan (src/fastdem.cpp:156-158)."""
    S = num_samples or default_num_samples(geom)
    ncell = geom.num_cells
    shape = geom.shape

    origin_inside = geom.is_inside(state.position, sensor_origin[:2])
    active = scan_mask & origin_inside

    # ---- 1. Observed evidence (scatter-add then clamp) ----
    ids, inside = geom.cell_id_of(state.position, xyz[:, :2])
    obs_valid = active & inside
    ids_obs = jnp.where(obs_valid, ids, ncell)
    add = (
        jnp.zeros(ncell + 1, dtype=jnp.float32)
        .at[ids_obs]
        .add(jnp.where(obs_valid, cfg.log_odds_observed, 0.0))[:ncell]
    ).reshape(shape)
    lo = state.layers[layers.visibility_logodds]
    lo_base = jnp.where(jnp.isnan(lo), 0.0, lo)
    lo1 = jnp.where(
        add > 0.0, jnp.minimum(lo_base + add, cfg.log_odds_max), lo
    )

    # ---- 2. Ray sampling -> per-cell min ray height ----
    dz = xyz[:, 2] - sensor_origin[2]
    dxy = xyz[:, :2] - sensor_origin[:2]
    ray_len_2d = jnp.linalg.norm(dxy, axis=1)
    # Skip upward rays (:173) and degenerate 2D rays (:53).
    ray_valid = active & (dz < 0.0) & (ray_len_2d >= 1e-4)

    t_exit = _clip_to_map(geom, state.position, sensor_origin, xyz)
    # Right-endpoint samples: t_j = t_exit * (j+1)/S.
    frac = (jnp.arange(S, dtype=jnp.float32) + 1.0) / S  # [S]
    t = t_exit[:, None] * frac[None, :]  # [R, S]
    sx = sensor_origin[0] + t * (xyz[:, 0] - sensor_origin[0])[:, None]
    sy = sensor_origin[1] + t * (xyz[:, 1] - sensor_origin[1])[:, None]
    sh = sensor_origin[2] + t * dz[:, None]
    samp_xy = jnp.stack([sx, sy], axis=-1)  # [R, S, 2]
    sids, s_inside = geom.cell_id_of(state.position, samp_xy)
    s_valid = ray_valid[:, None] & s_inside
    sids = jnp.where(s_valid, sids, ncell)
    ray_min = (
        jnp.full(ncell + 1, _INF, dtype=jnp.float32)
        .at[sids.reshape(-1)]
        .min(jnp.where(s_valid, sh, _INF).reshape(-1))[:ncell]
    ).reshape(shape)
    ray_touched = jnp.isfinite(ray_min)
    # Per-frame min-ray-height layer (reset each call, :242).
    ray_layer = jnp.where(ray_touched, ray_min, jnp.nan)

    # ---- 3. Resolve ghost cells (:188-214) ----
    elev = state.layers[layers.elevation]
    conflict = (
        ray_touched
        & jnp.isfinite(elev)
        & (elev > ray_min + cfg.height_conflict_threshold)
    )
    lo2 = jnp.where(
        conflict, jnp.where(jnp.isnan(lo1), 0.0, lo1) - cfg.log_odds_ghost, lo1
    )
    clear = conflict & (lo2 < cfg.clear_threshold)

    state = state.replace_layers(
        {layers.visibility_logodds: lo2, layers.raycasting: ray_layer}
    )
    # clearAt NaNs every layer at cleared cells (elevation_map.hpp:131-135),
    # then ghost_removal is set to 1 (:209-210).
    cleared = {
        k: jnp.where(clear, jnp.nan, v) for k, v in state.layers.items()
    }
    cleared[layers.ghost_removal] = jnp.where(
        clear, 1.0, state.layers[layers.ghost_removal]
    )
    return GridMapState(layers=cleared, position=state.position)
