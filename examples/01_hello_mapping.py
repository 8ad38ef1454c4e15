#!/usr/bin/env python
"""Hello mapping: one synthetic scan -> elevation map -> ASCII view.

Equivalent of /root/reference/fastdem/examples/01_hello_mapping/main.cpp:24.
Run: python examples/01_hello_mapping.py [--platform cpu]
"""
import sys

import numpy as np

from common import Timer, ascii_render, force_platform, generate_terrain_cloud

force_platform("cpu" if "--platform" in sys.argv and "cpu" in sys.argv else None)

import fastdem_tpu as fd
from fastdem_tpu.grid.gridmap import layers


def main():
    geom = fd.GridGeometry.from_length(10.0, 10.0, 0.1)
    mapper = fd.FastDEM(geom, fd.Config())
    cloud = generate_terrain_cloud(30000)
    I4 = np.eye(4, dtype=np.float32)

    with Timer("integrate (incl. compile)"):
        ok = mapper.integrate(cloud, I4, I4)
    assert ok
    with Timer("integrate (steady)"):
        mapper.integrate(cloud, I4, I4)

    elev = np.asarray(mapper.state.layers[layers.elevation])
    print(f"measured cells: {np.isfinite(elev).sum()} / {elev.size}")
    print(ascii_render(elev))


if __name__ == "__main__":
    main()
