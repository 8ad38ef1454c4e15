"""Depth-image ingestion: organized RGB-D frames -> point clouds.

The reference consumes RGB-D data as PointCloud2 produced upstream by the
camera driver; this module provides that upstream step natively so RGB-D
pipelines are self-contained: back-project a depth image through the pinhole
intrinsics into an (organized) cloud in the camera frame — the frame the
RGBDSensorModel expects (z = depth, rgbd_model.hpp:82-101).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from fastdem_tpu.cloud.pointcloud import PointCloud


def depth_to_cloud(
    depth: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    rgb: Optional[jnp.ndarray] = None,
    depth_scale: float = 1.0,
    min_depth: float = 0.0,
    max_depth: float = np.inf,
    stride: int = 1,
    frame_id: str = "camera",
    timestamp_ns: int = 0,
    count_valid: bool = True,
) -> PointCloud:
    """Back-project a depth image into a camera-frame cloud.

    Args:
      depth: f32/u16[H, W] depth image (multiplied by depth_scale to meters;
        use 0.001 for millimeter uint16 sensors).
      fx, fy, cx, cy: pinhole intrinsics.
      rgb: optional u8[H, W, 3] color image.
      stride: pixel subsampling step.

    Returns a fixed-capacity cloud of H//stride * W//stride points; invalid
    depths (<= 0, outside [min_depth, max_depth], non-finite) are masked.
    Camera convention: +z forward (depth), +x right, +y down.

    count_valid: populate the cloud's valid_count so FastDEM.integrate can
    auto-bucket heavily masked frames — the typical RGB-D case this module
    feeds (~60% invalid depth returns). Costs one scalar device sync per
    frame when the inputs are device arrays; ignored under jit tracing
    (where no host count exists). Pass False for latency-critical loops
    that never want the sync.
    """
    d = jnp.asarray(depth, dtype=jnp.float32)[::stride, ::stride] * depth_scale
    H, W = d.shape
    u = jnp.arange(W, dtype=jnp.float32)[None, :] * stride
    v = jnp.arange(H, dtype=jnp.float32)[:, None] * stride
    x = (u - cx) / fx * d
    y = (v - cy) / fy * d
    xyz = jnp.stack([x, y, d], axis=-1).reshape(-1, 3)
    valid = (
        jnp.isfinite(d) & (d > 0.0) & (d >= min_depth) & (d <= max_depth)
    ).reshape(-1)
    xyz = jnp.where(valid[:, None], xyz, 1e9)
    channels = {}
    if rgb is not None:
        channels["color"] = jnp.asarray(rgb)[::stride, ::stride].reshape(-1, 3)
    valid_count = -1
    if count_valid:
        import jax

        if not isinstance(valid, jax.core.Tracer):
            valid_count = int(jnp.count_nonzero(valid))
    return PointCloud(
        xyz=xyz,
        mask=valid,
        channels=channels,
        frame_id=frame_id,
        timestamp_ns=timestamp_ns,
        valid_count=valid_count,
    )


def camera_to_base_transform(
    roll: float = -np.pi / 2, pitch: float = 0.0, yaw: float = -np.pi / 2,
    t=(0.0, 0.0, 0.0),
) -> np.ndarray:
    """Common optical-frame -> robot-base convention: camera +z forward /
    +y down mapped onto base +x forward / +z up."""
    from fastdem_tpu.cloud.transform import from_rpy

    return np.asarray(from_rpy(roll, pitch, yaw, t=t))
