"""Application-edge bridges: map -> structured cloud / grid message /
visualization markers / boundary.

ROS-free equivalents of the reference's header-only bridge layer
(/root/reference/fastdem/include/fastdem/bridge/ros/impl.hpp:28-174 and
impl_visualization.hpp:28-138): the same payloads as plain numpy
structures, so any transport (ROS adapters, logging, websockets) can wrap
them. Internal ('_'-prefixed) layers are excluded, color unpacks from the
packed-float convention, and submap regions are supported.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from fastdem_tpu.grid import gridmap as gm
from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.grid.gridmap import GridMapState, layers


def to_structured_cloud(
    geom: GridGeometry,
    state: GridMapState,
    elevation_layer: str = layers.elevation,
    submap: Optional[Tuple[slice, slice]] = None,
) -> np.ndarray:
    """Map -> numpy structured array (the PointCloud2 payload equivalent).

    One record per finite-elevation cell: x, y, z plus one float field per
    non-internal layer and u8 r/g/b when a color layer exists
    (impl.hpp:67-174 semantics).
    """
    elev = np.asarray(state.layers[elevation_layer])
    rs = submap[0] if submap else slice(None)
    cs = submap[1] if submap else slice(None)
    elev = elev[rs, cs]
    x, y = geom.cell_centers(state.position)
    x = np.asarray(x)[rs, cs]
    y = np.asarray(y)[rs, cs]
    finite = np.isfinite(elev)

    float_layers = [
        name
        for name in state.layers
        if not gm.is_internal(name)
        and name not in (elevation_layer, layers.color)
    ]
    has_color = layers.color in state.layers

    fields = [("x", np.float32), ("y", np.float32), ("z", np.float32)]
    fields += [(name, np.float32) for name in float_layers]
    if has_color:
        fields += [("r", np.uint8), ("g", np.uint8), ("b", np.uint8)]

    out = np.zeros(int(finite.sum()), dtype=np.dtype(fields))
    out["x"] = x[finite]
    out["y"] = y[finite]
    out["z"] = elev[finite]
    for name in float_layers:
        out[name] = np.asarray(state.layers[name])[rs, cs][finite]
    if has_color:
        from fastdem_tpu.utils.colors import unpack_rgb

        packed = np.asarray(state.layers[layers.color])[rs, cs][finite]
        rgb = np.asarray(unpack_rgb(np.nan_to_num(packed)))
        out["r"], out["g"], out["b"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    return out


def to_grid_message(
    geom: GridGeometry,
    state: GridMapState,
    frame_id: str = "map",
    timestamp_ns: int = 0,
) -> Dict:
    """Map -> dict with geometry metadata + non-internal layer arrays (the
    grid_map_msgs equivalent; nanogrid::ros2::toMsg surface)."""
    return {
        "frame_id": frame_id,
        "timestamp_ns": timestamp_ns,
        "resolution": geom.resolution,
        "size": (geom.rows, geom.cols),
        "length": geom.length,
        "position": np.asarray(state.position, dtype=np.float64),
        "layers": {
            k: np.asarray(v)
            for k, v in state.layers.items()
            if not gm.is_internal(k)
        },
    }


def to_normal_markers(
    geom: GridGeometry,
    state: GridMapState,
    arrow_length: float = 0.15,
    stride: int = 1,
    max_slope_deg: float = 45.0,
) -> Dict[str, np.ndarray]:
    """Surface-normal line segments colored by slope
    (impl_visualization.hpp:28-138: LINE_LIST from cell center along the
    normal, color ramp green->red over [0, max_slope_deg]).

    Returns {'starts' f32[M,3], 'ends' f32[M,3], 'colors' f32[M,3]}.
    """
    req = (layers.elevation, layers.normal_x, layers.normal_y, layers.normal_z)
    if not all(k in state.layers for k in req):
        return {
            "starts": np.zeros((0, 3), np.float32),
            "ends": np.zeros((0, 3), np.float32),
            "colors": np.zeros((0, 3), np.float32),
        }
    elev = np.asarray(state.layers[layers.elevation])[::stride, ::stride]
    nx = np.asarray(state.layers[layers.normal_x])[::stride, ::stride]
    ny = np.asarray(state.layers[layers.normal_y])[::stride, ::stride]
    nz = np.asarray(state.layers[layers.normal_z])[::stride, ::stride]
    x, y = geom.cell_centers(state.position)
    x = np.asarray(x)[::stride, ::stride]
    y = np.asarray(y)[::stride, ::stride]
    ok = np.isfinite(elev) & np.isfinite(nx) & np.isfinite(ny) & np.isfinite(nz)

    starts = np.column_stack([x[ok], y[ok], elev[ok]]).astype(np.float32)
    normals = np.column_stack([nx[ok], ny[ok], nz[ok]]).astype(np.float32)
    ends = starts + arrow_length * normals

    if layers.slope in state.layers:
        slope = np.asarray(state.layers[layers.slope])[::stride, ::stride][ok]
    else:
        slope = np.degrees(np.arccos(np.clip(np.abs(normals[:, 2]), 0, 1)))
    t = np.clip(np.nan_to_num(slope) / max_slope_deg, 0.0, 1.0)
    colors = np.column_stack(
        [t, 1.0 - t, np.zeros_like(t)]
    ).astype(np.float32)
    return {"starts": starts, "ends": ends, "colors": colors}


def to_map_boundary(
    geom: GridGeometry, state: GridMapState
) -> np.ndarray:
    """Closed polygon of the map bounds (toMapBoundary equivalent),
    f32[5, 2] world xy."""
    pos = np.asarray(state.position, dtype=np.float64)
    hx = 0.5 * geom.rows * geom.resolution
    hy = 0.5 * geom.cols * geom.resolution
    return np.array(
        [
            [pos[0] + hx, pos[1] + hy],
            [pos[0] + hx, pos[1] - hy],
            [pos[0] - hx, pos[1] - hy],
            [pos[0] - hx, pos[1] + hy],
            [pos[0] + hx, pos[1] + hy],
        ],
        dtype=np.float32,
    )
