"""Point-to-cell rasterization via XLA scatter reductions.

Replaces the reference's per-point hash-map accumulation
(/root/reference/fastdem/src/elevation_mapping.cpp:41-92, the hottest loop in
the pipeline) with order-free scatter-min/max over flattened cell ids — the
shape XLA executes well on TPU (dense vector updates, no hash tables, no
data-dependent control flow).

Per-cell observation semantics (CellObservation,
mapping/elevation_mapping.hpp:26-34):
  min_z     = min over in-cell points' z
  min_z_var = z-variance of the min-z point (reference: variance of the FIRST
              point attaining the strict min in iteration order; we take the
              smallest variance among exact-tie minima — identical when the
              min is unique, which is the generic case; see SURVEY.md sec. 7
              'scatter tie-breaking')
  max_z     = max over in-cell points' z
  max_intensity = max intensity (if channel present)
  color     = packed color of the min-z point (reference: last written point;
              order-free deviation, visualization-only layer)

Out-of-map and masked points scatter into a dummy overflow cell that is
sliced off, so no branches exist in the hot loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from fastdem_tpu.grid.geometry import GridGeometry

_INF = jnp.inf


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CellObservations:
    """Dense per-cell observations from one scan. Untouched cells hold NaN
    (min_z/max_z/...) / False (touched)."""

    min_z: jnp.ndarray
    min_z_var: jnp.ndarray
    max_z: jnp.ndarray
    touched: jnp.ndarray
    max_intensity: Optional[jnp.ndarray]
    color: Optional[jnp.ndarray]


def rasterize(
    geom: GridGeometry,
    position: jnp.ndarray,
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    z_var: jnp.ndarray,
    intensity: Optional[jnp.ndarray] = None,
    color_packed: Optional[jnp.ndarray] = None,
) -> CellObservations:
    """Scatter one scan into per-cell min/max observations.

    Args:
      geom: static grid geometry.
      position: f32[2] map center.
      xyz: f32[N, 3] world-frame points.
      mask: bool[N] valid points.
      z_var: f32[N] world-frame z variance per point (Sigma_world[2,2]).
      intensity: optional f32[N].
      color_packed: optional f32[N] packed RGB.
    """
    ncell = geom.num_cells
    shape = geom.shape
    ids, inside = geom.cell_id_of(position, xyz[:, :2])
    valid = mask & inside
    ids = jnp.where(valid, ids, ncell)

    z = jnp.where(valid, xyz[:, 2], _INF)
    min_z = (
        jnp.full(ncell + 1, _INF, dtype=jnp.float32).at[ids].min(z)[:ncell]
    )
    z_neg = jnp.where(valid, xyz[:, 2], -_INF)
    max_z = (
        jnp.full(ncell + 1, -_INF, dtype=jnp.float32).at[ids].max(z_neg)[:ncell]
    )
    touched = jnp.isfinite(min_z)

    # Variance carried by the (tie-smallest) min-z point.
    cell_min_at_pt = min_z[jnp.minimum(ids, ncell - 1)]
    at_min = valid & (xyz[:, 2] == cell_min_at_pt)
    var_cand = jnp.where(at_min, z_var, _INF)
    min_z_var = (
        jnp.full(ncell + 1, _INF, dtype=jnp.float32).at[ids].min(var_cand)[:ncell]
    )

    max_intensity = None
    if intensity is not None:
        i_cand = jnp.where(valid, intensity, -_INF)
        max_intensity = (
            jnp.full(ncell + 1, -_INF, dtype=jnp.float32)
            .at[ids]
            .max(i_cand)[:ncell]
        )
        max_intensity = jnp.where(
            jnp.isfinite(max_intensity), max_intensity, jnp.nan
        ).reshape(shape)

    color = None
    if color_packed is not None:
        c_cand = jnp.where(at_min, color_packed, _INF)
        color = (
            jnp.full(ncell + 1, _INF, dtype=jnp.float32)
            .at[ids]
            .min(c_cand)[:ncell]
        )
        color = jnp.where(jnp.isfinite(color), color, jnp.nan).reshape(shape)

    return CellObservations(
        min_z=jnp.where(touched, min_z, jnp.nan).reshape(shape),
        min_z_var=jnp.where(touched, min_z_var, jnp.nan).reshape(shape),
        max_z=jnp.where(touched, max_z, jnp.nan).reshape(shape),
        touched=touched.reshape(shape),
        max_intensity=max_intensity,
        color=color,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CellStats:
    """Batch per-cell statistics (offline DEM path; reference BatchCellStats,
    src/pcd_convert.cpp:32-59)."""

    mean: jnp.ndarray
    variance: jnp.ndarray
    min_z: jnp.ndarray
    max_z: jnp.ndarray
    count: jnp.ndarray
    touched: jnp.ndarray
    max_intensity: Optional[jnp.ndarray]
    color: Optional[jnp.ndarray]


def rasterize_stats(
    geom: GridGeometry,
    position: jnp.ndarray,
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    intensity: Optional[jnp.ndarray] = None,
    color_packed: Optional[jnp.ndarray] = None,
) -> CellStats:
    """Per-cell count/mean/sample-variance/min/max in one scatter pass.

    The reference accumulates Welford-style per point
    (pcd_convert.cpp:44-53); on TPU we use the sum/sum-of-squares form:
    var = (sum_sq - sum^2/n) / (n - 1), computed around a per-cell pivot
    (the cell min) for numerical stability at large absolute heights.
    """
    ncell = geom.num_cells
    shape = geom.shape
    ids, inside = geom.cell_id_of(position, xyz[:, :2])
    valid = mask & inside
    ids = jnp.where(valid, ids, ncell)

    z = xyz[:, 2]
    zmin = (
        jnp.full(ncell + 1, _INF, dtype=jnp.float32)
        .at[ids]
        .min(jnp.where(valid, z, _INF))[:ncell]
    )
    zmax = (
        jnp.full(ncell + 1, -_INF, dtype=jnp.float32)
        .at[ids]
        .max(jnp.where(valid, z, -_INF))[:ncell]
    )
    cnt = (
        jnp.zeros(ncell + 1, dtype=jnp.float32)
        .at[ids]
        .add(valid.astype(jnp.float32))[:ncell]
    )
    touched = cnt > 0

    pivot = jnp.where(touched, zmin, 0.0)
    dz = jnp.where(valid, z - pivot[jnp.minimum(ids, ncell - 1)], 0.0)
    s1 = jnp.zeros(ncell + 1, dtype=jnp.float32).at[ids].add(dz)[:ncell]
    s2 = jnp.zeros(ncell + 1, dtype=jnp.float32).at[ids].add(dz * dz)[:ncell]
    mean = pivot + s1 / jnp.maximum(cnt, 1.0)
    var = jnp.where(
        cnt >= 2.0,
        jnp.maximum(s2 - s1 * s1 / jnp.maximum(cnt, 1.0), 0.0)
        / jnp.maximum(cnt - 1.0, 1.0),
        0.0,
    )

    max_intensity = None
    if intensity is not None:
        mi = (
            jnp.full(ncell + 1, -_INF, dtype=jnp.float32)
            .at[ids]
            .max(jnp.where(valid, intensity, -_INF))[:ncell]
        )
        max_intensity = jnp.where(jnp.isfinite(mi), mi, jnp.nan).reshape(shape)

    color = None
    if color_packed is not None:
        at_min = valid & (z == zmin[jnp.minimum(ids, ncell - 1)])
        c = (
            jnp.full(ncell + 1, _INF, dtype=jnp.float32)
            .at[ids]
            .min(jnp.where(at_min, color_packed, _INF))[:ncell]
        )
        color = jnp.where(jnp.isfinite(c), c, jnp.nan).reshape(shape)

    nan = jnp.nan
    return CellStats(
        mean=jnp.where(touched, mean, nan).reshape(shape),
        variance=jnp.where(touched, var, nan).reshape(shape),
        min_z=jnp.where(touched, zmin, nan).reshape(shape),
        max_z=jnp.where(touched, zmax, nan).reshape(shape),
        count=cnt.reshape(shape),
        touched=touched.reshape(shape),
        max_intensity=max_intensity,
        color=color,
    )
