#!/usr/bin/env python
"""Online mode with calibration/odometry providers (mock TF).

Equivalent of /root/reference/fastdem/examples/04_transform_provider/
main.cpp:27-51 with its mock Calibration/Odometry.
"""
import sys

import numpy as np

from common import force_platform, generate_terrain_cloud

force_platform("cpu" if "cpu" in sys.argv else None)

import fastdem_tpu as fd
from fastdem_tpu.grid.gridmap import layers
from fastdem_tpu.runtime.providers import StaticCalibration, TransformBuffer


def main():
    geom = fd.GridGeometry.from_length(12.0, 12.0, 0.1)
    mapper = fd.FastDEM(geom, fd.Config())

    calib = StaticCalibration("base_link")
    T_bs = np.eye(4, dtype=np.float32)
    T_bs[2, 3] = 0.8  # sensor 0.8 m above base
    calib.set_extrinsic("lidar", T_bs)

    odom = TransformBuffer(max_stale_time=0.5)
    mapper.set_calibration_provider(calib).set_odometry_provider(odom)

    for i in range(5):
        t_ns = 1_000_000_000 * (i + 1)
        T_wb = np.eye(4)
        T_wb[0, 3] = 0.3 * i  # robot driving +x
        odom.add_pose(t_ns, T_wb)
        cloud = generate_terrain_cloud(20000, seed=i)
        cloud.timestamp_ns = t_ns
        ok = mapper.integrate(cloud)
        print(f"scan {i}: integrated={ok} map center="
              f"{np.asarray(mapper.state.position)}")

    elev = np.asarray(mapper.state.layers[layers.elevation])
    print(f"measured cells: {np.isfinite(elev).sum()}")


if __name__ == "__main__":
    main()
