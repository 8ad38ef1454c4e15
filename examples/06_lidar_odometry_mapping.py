#!/usr/bin/env python
"""SLAM-lite capstone: GICP scan-to-scan odometry feeding the mapper.

Ties the framework together end to end: consecutive scans are aligned with
GICP to estimate the robot trajectory (no external odometry), the estimated
poses stream into the TransformBuffer, and the mapping pipeline builds the
elevation map online. Reports trajectory drift against ground truth and
map coverage.
"""
import sys

import numpy as np

from common import Timer, ascii_render, force_platform

force_platform("cpu" if "cpu" in sys.argv else None)

import fastdem_tpu as fd
from fastdem_tpu.cloud import pointcloud as pc
from fastdem_tpu.cloud import registration as reg
from fastdem_tpu.cloud import transform as tfm
from fastdem_tpu.grid.gridmap import layers
from fastdem_tpu.runtime.providers import StaticCalibration, TransformBuffer


def world_scan(rng, T_wb, n=6000):
    """Scan of structured terrain, expressed in the SENSOR frame of a robot
    at pose T_wb (sensor = base here)."""
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = rng.uniform(0.8, 7.0, n)
    # world-frame samples around the robot
    wx = T_wb[0, 3] + rad * np.cos(ang)
    wy = T_wb[1, 3] + rad * np.sin(ang)
    wz = (
        0.25 * np.sin(0.7 * wx) * np.cos(0.5 * wy)
        + 0.1 * np.sin(2.1 * wx + 0.5)
        + rng.normal(0, 0.01, n)
    )
    world = np.column_stack([wx, wy, wz]).astype(np.float32)
    T_bw = np.asarray(tfm.inverse(T_wb), dtype=np.float32)
    return (world @ T_bw[:3, :3].T + T_bw[:3, 3]).astype(np.float32)


def main():
    rng = np.random.default_rng(5)
    steps = 8
    # Ground-truth trajectory: arc with slight yaw.
    truth = []
    for k in range(steps):
        T = np.asarray(tfm.from_rpy(0, 0, 0.04 * k, t=[0.35 * k, 0.05 * k, 0]))
        truth.append(np.asarray(T, dtype=np.float32))

    geom = fd.GridGeometry.from_length(14.0, 14.0, 0.1)
    mapper = fd.FastDEM(geom, fd.Config())
    calib = StaticCalibration()
    calib.set_extrinsic("lidar", np.eye(4, dtype=np.float32))
    odom = TransformBuffer(max_stale_time=1.0)
    mapper.set_calibration_provider(calib).set_odometry_provider(odom)

    scans = [world_scan(rng, truth[k]) for k in range(steps)]

    T_est = np.eye(4, dtype=np.float32)
    drift = []
    with Timer("odometry + mapping (8 scans)"):
        for k in range(steps):
            if k > 0:
                res = reg.align(
                    pc.from_numpy(scans[k]),
                    pc.from_numpy(scans[k - 1]),
                    method="gicp",
                    max_iterations=25,
                    max_correspondence_distance=1.0,
                )
                # T_est maps scan k into the world via the previous pose.
                T_est = (T_est @ res.T).astype(np.float32)
            t_ns = (k + 1) * 1_000_000_000
            odom.add_pose(t_ns, T_est)
            cloud = pc.from_numpy(scans[k], frame_id="lidar", timestamp_ns=t_ns)
            assert mapper.integrate(cloud)
            err = np.linalg.norm(T_est[:3, 3] - truth[k][:3, 3])
            drift.append(err)

    print(f"final translation drift: {drift[-1]*100:.1f} cm over "
          f"{np.linalg.norm(truth[-1][:3,3]):.2f} m traveled")
    elev = np.asarray(mapper.state.layers[layers.elevation])
    print(f"map coverage: {np.isfinite(elev).sum()} cells")
    print(ascii_render(elev))
    assert drift[-1] < 0.15, "odometry drifted too far"


if __name__ == "__main__":
    main()
