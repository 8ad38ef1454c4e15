"""Offline batch DEM building (pcd_convert equivalent).

Equivalents of /root/reference/fastdem/src/pcd_convert.cpp:
  * from_pointcloud (:63-153): per-cell count/mean/variance/min/max stats +
    elevation by RasterMethod (Max/Min/Mean/MinMax), intensity max,
    min-z-point color (reference: last write).
  * auto-sized overload (:155-185): bbox + one-cell margin geometry.
  * remove_floating_points (:228-269): per-cell z-histogram ground peak +
    cutoff — reformulated sort-based: points sorted by (cell, z-bin), group
    counts via segmented sums, per-cell modal bin via an encoded segmented
    max (count * K - bin reproduces the reference's first-max-bin tie rule),
    so no dense [cells, bins] histogram is materialized.
  * build_dem (:275-323): SOR -> bbox geometry -> floating-point removal ->
    rasterize -> inpaint.
  * to_pointcloud (:327-373): map -> cloud at cell centers with
    intensity/color carried over.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdem_tpu.cloud import filters as pcf
from fastdem_tpu.cloud.pointcloud import PointCloud, from_numpy
from fastdem_tpu.config.config import RasterMethod
from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.grid.gridmap import GridMapState, layers
from fastdem_tpu.mapping.rasterize import rasterize_stats
from fastdem_tpu.postprocess.inpainting import inpaint
from fastdem_tpu.utils.colors import pack_rgb, unpack_rgb


@dataclasses.dataclass
class DEMConfig:
    """Mirrors fastdem::DEMConfig (include/fastdem/io/pcd_convert.hpp:28-42)."""

    resolution: float = 0.1
    method: RasterMethod = RasterMethod.MAX
    sor_k: int = 20
    sor_std_mul: float = 1.0
    height_threshold: float = 2.0
    bin_size: float = 0.0  # 0 -> use resolution
    inpaint_iterations: int = 3


def bbox_geometry(
    xyz: np.ndarray, mask: np.ndarray, resolution: float
) -> Tuple[GridGeometry, np.ndarray]:
    """Auto-size geometry: bbox + one-cell margin (pcd_convert.cpp:174-181)."""
    pts = np.asarray(xyz)[np.asarray(mask)]
    finite = np.isfinite(pts[:, :2]).all(axis=1)
    pts = pts[finite]
    min_x, min_y = pts[:, 0].min(), pts[:, 1].min()
    max_x, max_y = pts[:, 0].max(), pts[:, 1].max()
    width = max_x - min_x + resolution
    height = max_y - min_y + resolution
    geom = GridGeometry.from_length(width, height, resolution)
    position = np.array(
        [(min_x + max_x) / 2.0, (min_y + max_y) / 2.0], dtype=np.float32
    )
    return geom, position


def from_pointcloud(
    cloud: PointCloud,
    geom: GridGeometry,
    position,
    method: RasterMethod = RasterMethod.MAX,
) -> GridMapState:
    """Rasterize a full cloud into a fresh map state (pcd_convert.cpp:63-153)."""
    has_i = cloud.has("intensity")
    has_c = cloud.has("color")
    stats = rasterize_stats(
        geom,
        jnp.asarray(position, dtype=jnp.float32),
        cloud.xyz,
        cloud.mask,
        intensity=cloud.channels.get("intensity"),
        color_packed=pack_rgb(cloud.channels["color"]) if has_c else None,
    )
    if method == RasterMethod.MAX or method == RasterMethod.MINMAX:
        elev = stats.max_z
    elif method == RasterMethod.MIN:
        elev = stats.min_z
    else:
        elev = stats.mean
    lyr = {
        layers.elevation: elev,
        layers.elevation_min: stats.min_z,
        layers.elevation_max: stats.max_z,
        layers.variance: stats.variance,
        layers.n_points: stats.count,
    }
    if has_i:
        lyr[layers.intensity] = stats.max_intensity
    if has_c:
        lyr[layers.color] = stats.color
    return GridMapState(
        layers=lyr, position=jnp.asarray(position, dtype=jnp.float32)
    )


def from_pointcloud_auto(
    cloud: PointCloud, resolution: float, method: RasterMethod = RasterMethod.MAX
) -> Tuple[GridGeometry, GridMapState]:
    geom, position = bbox_geometry(
        np.asarray(cloud.xyz), np.asarray(cloud.mask), resolution
    )
    return geom, from_pointcloud(cloud, geom, position, method)


def remove_floating_points(
    cloud: PointCloud,
    geom: GridGeometry,
    position,
    height_threshold: float,
    bin_size: float,
    max_bins: int = 512,
) -> PointCloud:
    """Drop points above (per-cell ground peak + height_threshold).

    Ground peak = the modal z-histogram bin of the cell (first max on ties,
    pcd_convert.cpp:194-220), bin origin at the cell's min z. Cells whose
    z-range exceeds max_bins * bin_size clamp extra points into the top bin
    (beyond any realistic canopy height at the configured bin sizes).
    """
    n = cloud.capacity
    pos = jnp.asarray(position, dtype=jnp.float32)
    ids, inside = geom.cell_id_of(pos, cloud.xyz[:, :2])
    valid = cloud.mask & inside
    ncell = geom.num_cells
    ids_eff = jnp.where(valid, ids, ncell)

    z = cloud.xyz[:, 2]
    zmin_cell = (
        jnp.full(ncell + 1, jnp.inf)
        .at[ids_eff]
        .min(jnp.where(valid, z, jnp.inf))
    )
    z0 = zmin_cell[jnp.minimum(ids_eff, ncell)]
    zbin = jnp.clip(
        jnp.floor((z - z0) / bin_size).astype(jnp.int32), 0, max_bins - 1
    )
    zbin = jnp.where(valid, zbin, max_bins)

    # Sort by (validity, cell, bin); group = run of equal (cell, bin).
    invalid = (~valid).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    inv_s, ids_sorted, bin_sorted, order = jax.lax.sort(
        (invalid, ids_eff, zbin, idx), num_keys=3, is_stable=True
    )
    valid_s = inv_s == 0
    new_group = (
        (ids_sorted != jnp.roll(ids_sorted, 1))
        | (bin_sorted != jnp.roll(bin_sorted, 1))
    ).at[0].set(True) & valid_s
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    gid = jnp.where(valid_s, gid, n)
    counts = jax.ops.segment_sum(
        valid_s.astype(jnp.int32), gid, num_segments=n + 1
    )
    g_count = counts[jnp.minimum(gid, n)]
    # Per-cell best group: max count, ties -> lowest bin (first max in the
    # reference's ascending-bin scan). Encode as count * max_bins - bin.
    pref = jnp.where(valid_s, g_count * max_bins - bin_sorted, -1)
    best_pref = (
        jnp.full(ncell + 1, -1, dtype=jnp.int32).at[ids_sorted].max(pref)
    )
    # best_pref = count * max_bins - bin  ->  bin = (-best_pref) mod max_bins
    best_bin_cell = (-best_pref[jnp.minimum(ids_eff, ncell)]) % max_bins
    ground_z = z0 + (best_bin_cell.astype(jnp.float32) + 0.5) * bin_size
    cutoff = ground_z + height_threshold
    keep = valid & (z <= cutoff)
    return cloud.with_mask(keep)


def build_dem(
    cloud: PointCloud, config: Optional[DEMConfig] = None
) -> Tuple[GridGeometry, GridMapState]:
    """Full offline pipeline (pcd_convert.cpp:275-323)."""
    cfg = config or DEMConfig()
    filtered = pcf.statistical_outlier_removal(
        cloud, cfg.sor_k, cfg.sor_std_mul
    )
    geom, position = bbox_geometry(
        np.asarray(filtered.xyz), np.asarray(filtered.mask), cfg.resolution
    )
    bin_size = cfg.bin_size if cfg.bin_size > 0 else cfg.resolution
    filtered = remove_floating_points(
        filtered, geom, position, cfg.height_threshold, bin_size
    )
    state = from_pointcloud(filtered, geom, position, cfg.method)
    if cfg.inpaint_iterations > 0:
        state = state.replace_layer(
            layers.elevation,
            inpaint(
                state.layers[layers.elevation],
                cfg.inpaint_iterations,
                min_valid_neighbors=2,
            ),
        )
    return geom, state


def to_pointcloud(geom: GridGeometry, state: GridMapState) -> PointCloud:
    """Map -> cloud at cell centers (pcd_convert.cpp:327-373)."""
    elev = np.asarray(state.layers[layers.elevation])
    finite = np.isfinite(elev)
    x, y = geom.cell_centers(state.position)
    xyz = np.column_stack(
        [
            np.asarray(x)[finite],
            np.asarray(y)[finite],
            elev[finite],
        ]
    ).astype(np.float32)
    channels = {}
    if layers.intensity in state.layers:
        inten = np.asarray(state.layers[layers.intensity])[finite]
        channels["intensity"] = np.where(np.isfinite(inten), inten, 0.0).astype(
            np.float32
        )
    if layers.color in state.layers:
        packed = np.asarray(state.layers[layers.color])[finite]
        rgb = np.asarray(unpack_rgb(jnp.asarray(np.nan_to_num(packed))))
        channels["color"] = rgb
    return from_numpy(xyz, frame_id="map", **channels)
