#!/usr/bin/env python
"""Live browser viewer + RGB-D auto-bucketing.

Streams synthetic RGB-D frames (60% invalid depth, like a real structured-
light camera outdoors) into the mapper while serving the live 3D viewer
(io/live_viewer.py — the Rerun-bridge-equivalent live inspection). Heavily
masked frames are auto-compacted to the capacity ladder by
FastDEM.integrate, so each frame costs its VALID points, not its capacity.

Run: python examples/10_live_viewer_rgbd.py [--platform cpu] [--hold N]
(--hold keeps the viewer serving N extra seconds so you can browse it.)
"""
import sys
import time

import numpy as np

from common import Timer, force_platform

force_platform("cpu" if "--platform" in sys.argv and "cpu" in sys.argv else None)

import fastdem_tpu as fd
from fastdem_tpu.cloud import pointcloud as pc
from fastdem_tpu.grid.gridmap import layers
from fastdem_tpu.io.live_viewer import LiveViewer


def rgbd_frame(rng, cx, n=40000, invalid_frac=0.6):
    """A forward-looking depth frame around the robot at (cx, 0)."""
    x = rng.uniform(-4.0, 4.0, n)
    y = rng.uniform(-4.0, 4.0, n)
    z = 0.3 * np.sin(0.6 * (x + cx)) * np.cos(0.5 * y) - 1.0
    pts = np.column_stack([x, y, z + rng.normal(0, 0.01, n)]).astype(
        np.float32
    )
    pts[rng.random(n) < invalid_frac] = np.nan  # invalid depth returns
    return pc.from_numpy(pts, frame_id="camera")


def main():
    geom = fd.GridGeometry.from_length(15.0, 15.0, 0.1)
    cfg = fd.Config()
    cfg.sensor_model.type = fd.SensorType.RGBD
    mapper = fd.FastDEM(geom, cfg)
    lv = LiveViewer(port=0).start()
    print(f"live viewer: {lv.url}  (open in a browser; updates per frame)")

    rng = np.random.default_rng(3)
    capacities = []
    mapper.on_preprocessed = lambda aux: capacities.append(
        aux.world_xyz.shape[0]
    )
    T_bs = np.eye(4, dtype=np.float32)
    T_bs[2, 3] = 0.5
    with Timer("10 RGB-D frames (incl. compile)"):
        for k in range(10):
            cloud = rgbd_frame(rng, 0.2 * k)
            T_wb = np.eye(4, dtype=np.float32)
            T_wb[0, 3] = 0.2 * k
            assert mapper.integrate(cloud, T_bs, T_wb)
            lv.publish(geom, mapper.state)

    elev = np.asarray(mapper.state.layers[layers.elevation])
    print(
        f"frames ran at capacity {capacities[0]} of {cloud.capacity} "
        f"(auto-bucketed: ~{cloud.valid_count} valid points/frame); "
        f"{np.isfinite(elev).sum()} cells mapped"
    )

    hold = 0
    if "--hold" in sys.argv:
        hold = int(sys.argv[sys.argv.index("--hold") + 1])
    if hold:
        print(f"serving {lv.url} for {hold}s ...")
        time.sleep(hold)
    lv.stop()


if __name__ == "__main__":
    main()
