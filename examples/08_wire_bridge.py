#!/usr/bin/env python
"""Wire bridge: map a few scans, then emit the robot-consumable message
encodings — a real sensor_msgs/PointCloud2 (byte-layout identical to the
reference ROS bridge, see runtime/wire.py), a grid_map_msgs/GridMap
structure, and a pcl::PointXYZI-compatible record buffer.

Equivalent surface: /root/reference/fastdem/include/fastdem/bridge/
(ros/impl.hpp, ros2.hpp) and nanoPCL's bridge/{ros,pcl}.hpp — without a
ROS runtime: the messages here are the transport-invariant content a DDS
or TCPROS layer would frame.

Run: python examples/08_wire_bridge.py [--platform cpu]
"""
import sys

import numpy as np

from common import force_platform, generate_terrain_cloud

force_platform("cpu" if "--platform" in sys.argv and "cpu" in sys.argv else None)

import fastdem_tpu as fd
from fastdem_tpu.runtime import wire


def main():
    geom = fd.GridGeometry.from_length(12.0, 12.0, 0.1)
    mapper = fd.FastDEM(geom, fd.Config())
    I4 = np.eye(4, dtype=np.float32)
    for k in range(3):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.4 * k
        assert mapper.integrate(generate_terrain_cloud(20000, seed=k), I4, T)

    # 1. Map -> sensor_msgs/PointCloud2 (one point per mapped cell, every
    #    non-internal layer as a float field).
    msg = wire.map_to_pointcloud2(
        geom, mapper.state, frame_id="map", stamp_ns=123
    )
    print(f"PointCloud2: {msg.width} pts, point_step {msg.point_step}, "
          f"fields: {[f.name for f in msg.fields]}")
    print(f"  data: {len(msg.data)} bytes "
          f"(= width x point_step: {msg.width * msg.point_step})")

    # 2. Map -> grid_map_msgs/GridMap structure.
    gm_msg = wire.map_to_gridmap_msg(geom, mapper.state, frame_id="map")
    print(f"GridMap msg: layers {gm_msg['layers'][:4]}..., "
          f"{gm_msg['info']['length_x']:.0f}x"
          f"{gm_msg['info']['length_y']:.0f} m @ "
          f"{gm_msg['info']['resolution']} m")

    # 3. Scan cloud -> PointCloud2 and back (nanoPCL codec conventions),
    #    and -> a pcl::PointXYZI-compatible buffer.
    scan = generate_terrain_cloud(5000, seed=9)
    scan_msg = wire.cloud_to_pointcloud2(scan, stamp_ns=456)
    back = wire.pointcloud2_to_cloud(scan_msg)
    assert back.count() == int(np.asarray(scan.mask).sum())
    pcl_buf = wire.cloud_to_pcl(scan, "PointXYZI")
    print(f"cloud codec round trip OK ({back.count()} pts); "
          f"PCL PointXYZI buffer: {pcl_buf.nbytes} bytes "
          f"({pcl_buf.dtype.itemsize} B/pt)")


if __name__ == "__main__":
    main()
