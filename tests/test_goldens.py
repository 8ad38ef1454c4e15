"""Golden regression tests: the pipeline's output on fixed seeds is frozen.

The C++ reference cannot be built in this environment (PARITY.md), so these
goldens freeze THIS implementation's behavior: any unintended numerical
drift in the rasterizer/estimators/raycaster across refactors fails here.
Regenerate deliberately with: python tests/test_goldens.py --regen
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def run_session(estimator: str):
    import fastdem_tpu as fd
    from fastdem_tpu.cloud import pointcloud as pc

    geom = fd.GridGeometry.from_length(12.0, 12.0, 0.2)
    cfg = fd.Config()
    cfg.mapping.estimation_type = (
        fd.EstimationType.P2_QUANTILE
        if estimator == "p2"
        else fd.EstimationType.KALMAN
    )
    cfg.raycasting.enabled = True
    cfg.point_filter.range_max = 10.0
    m = fd.FastDEM(geom, cfg)
    rng = np.random.default_rng(1234)
    T_bs = np.eye(4, dtype=np.float32)
    T_bs[2, 3] = 0.8
    for k in range(6):
        n = 6000
        ang = rng.uniform(0, 2 * np.pi, n)
        rad = rng.uniform(0.5, 5.5, n)
        x = rad * np.cos(ang)
        y = rad * np.sin(ang)
        z = 0.25 * np.sin(0.7 * x) * np.cos(0.5 * y) - 0.8 + rng.normal(
            0, 0.02, n
        )
        T_wb = np.eye(4, dtype=np.float32)
        T_wb[0, 3] = 0.1 * k
        cloud = pc.from_numpy(
            np.column_stack([x, y, z]).astype(np.float32), frame_id="lidar"
        )
        assert m.integrate(cloud, T_bs, T_wb)
    return geom, m.state


GOLDEN_LAYERS = (
    "elevation",
    "elevation_min",
    "elevation_max",
    "variance",
    "n_points",
    "upper_bound",
    "lower_bound",
    "obstacle",
    "_visibility_logodds",
)


def golden_path(estimator):
    return os.path.join(GOLDEN_DIR, f"session_{estimator}.npz")


@pytest.mark.parametrize("estimator", ["kalman", "p2"])
def test_pipeline_matches_golden(estimator):
    path = golden_path(estimator)
    if not os.path.exists(path):
        pytest.skip("golden not generated (run tests/test_goldens.py --regen)")
    _, state = run_session(estimator)
    with np.load(path) as data:
        for name in GOLDEN_LAYERS:
            got = np.asarray(state.layers[name])
            np.testing.assert_allclose(
                got,
                data[name],
                rtol=1e-5,
                atol=1e-6,
                equal_nan=True,
                err_msg=f"{estimator}/{name} drifted from golden",
            )


if __name__ == "__main__":
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for est in ("kalman", "p2"):
            _, state = run_session(est)
            arrays = {
                name: np.asarray(state.layers[name]) for name in GOLDEN_LAYERS
            }
            with open(golden_path(est), "wb") as f:
                np.savez_compressed(f, **arrays)
            print(f"wrote {golden_path(est)}")
