#!/usr/bin/env python
"""Kalman vs P2-quantile estimator comparison on noisy terrain.

Equivalent of /root/reference/fastdem/examples/03_estimator_comparison.
"""
import sys

import numpy as np

from common import force_platform, generate_terrain_cloud

force_platform("cpu" if "cpu" in sys.argv else None)

import fastdem_tpu as fd
from fastdem_tpu.grid.gridmap import layers


def run(estimator, scans=8):
    geom = fd.GridGeometry.from_length(10.0, 10.0, 0.1)
    cfg = fd.Config()
    cfg.mapping.estimation_type = estimator
    mapper = fd.FastDEM(geom, cfg)
    I4 = np.eye(4, dtype=np.float32)
    for s in range(scans):
        mapper.integrate(generate_terrain_cloud(20000, seed=s), I4, I4)
    elev = np.asarray(mapper.state.layers[layers.elevation])
    x, y = geom.cell_centers(mapper.state.position)
    truth = 0.3 * np.sin(np.asarray(x) * 0.5) * np.cos(np.asarray(y) * 0.5)
    err = np.abs(elev - truth)[np.isfinite(elev)]
    return np.isfinite(elev).sum(), np.mean(err), np.percentile(err, 95)


def main():
    for est in (fd.EstimationType.KALMAN, fd.EstimationType.P2_QUANTILE):
        cells, mae, p95 = run(est)
        print(
            f"{est.value:>14}: cells={cells} MAE={mae*100:.2f} cm "
            f"p95={p95*100:.2f} cm"
        )


if __name__ == "__main__":
    main()
