#!/usr/bin/env python
"""Config loading: YAML preset -> Config -> mapper.

Equivalent of /root/reference/fastdem/examples/02_config_loading.
"""
import os
import sys

import numpy as np

from common import force_platform, generate_terrain_cloud

force_platform("cpu" if "cpu" in sys.argv else None)

import fastdem_tpu as fd


def main():
    preset = os.path.join(
        os.path.dirname(__file__), "..", "fastdem_tpu", "config", "presets",
        "default.yaml",
    )
    cfg = fd.load_config(preset)
    print(
        f"mode={cfg.mapping.mode.value} estimator="
        f"{cfg.mapping.estimation_type.value} sensor={cfg.sensor_model.type.value} "
        f"raycast={cfg.raycasting.enabled}"
    )
    geom = fd.GridGeometry.from_length(10.0, 10.0, 0.1)
    mapper = fd.FastDEM(geom, cfg)
    I4 = np.eye(4, dtype=np.float32)
    assert mapper.integrate(generate_terrain_cloud(20000), I4, I4)
    print("integrated one scan with the loaded config")


if __name__ == "__main__":
    main()
