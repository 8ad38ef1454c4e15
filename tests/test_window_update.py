"""Window-local map updates (pipeline `window_update`).

On maps larger than the sensor range, per-scan work — the rasterizer's
scatter tables AND the dense estimator/min-max/obstacle/raycast layer
passes — runs on a sensor-centered window of ~2*range extent
(dynamic-sliced, updated, written back), making per-scan cost O(range^2)
instead of O(map area). Every touched cell lies inside the window (the
range filter bounds points in the BASE frame; the window carries the same
2 m base->sensor margin as the polar-field bound), so results must be
EXACTLY equal to the full-map path — these tests assert bitwise equality
on every layer, the aux observations, and the position.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastdem_tpu import Config, GridGeometry
from fastdem_tpu.config.config import EstimationType, MappingMode
from fastdem_tpu.mapping.pipeline import build_integrate, create_map_state


def _run(geom, cfg, window_update, rng_seed=0, K=5, N=4096, step_x=2.0,
         x0=-4.0):
    rng = np.random.default_rng(rng_seed)
    step = build_integrate(
        geom, cfg, has_intensity=True, donate=False,
        window_update=window_update,
    )
    s = create_map_state(geom, cfg, has_intensity=True)
    aux = None
    T_bs = np.eye(4, dtype=np.float32)
    T_bs[2, 3] = 1.0
    for k in range(K):
        ang = rng.uniform(0, 2 * np.pi, N)
        rad = rng.uniform(0.5, 5.8, N)
        px = x0 + step_x * k
        x = rad * np.cos(ang)
        y = rad * np.sin(ang)
        z = (
            0.2 * np.sin(0.6 * (x + px)) * np.cos(0.5 * y)
            - 1.0
            + rng.normal(0, 0.02, N)
        )
        xyz = np.stack([x, y, z], -1).astype(np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = px
        mask = np.ones(N, bool)
        mask[:37] = False
        inten = rng.random(N).astype(np.float32)
        s, aux = step(
            s, jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(T_bs),
            jnp.asarray(pose), jnp.asarray(inten),
        )
    return s, aux


def _assert_exact(s1, a1, s2, a2):
    assert set(s1.layers) == set(s2.layers)
    for k in s1.layers:
        np.testing.assert_array_equal(
            np.asarray(s1.layers[k]), np.asarray(s2.layers[k]),
            err_msg=f"layer {k}",
        )
    np.testing.assert_array_equal(
        np.asarray(s1.position), np.asarray(s2.position)
    )
    for f in ("min_z", "min_z_var", "max_z", "touched", "max_intensity",
              "voxel_count"):
        va, vb = getattr(a1.obs, f), getattr(a2.obs, f)
        if va is None:
            assert vb is None
            continue
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=f"aux obs.{f}"
        )


@pytest.mark.parametrize("raycast", [False, True])
@pytest.mark.parametrize(
    "est", [EstimationType.KALMAN, EstimationType.P2_QUANTILE]
)
def test_global_windowed_exact(raycast, est):
    cfg = Config()
    cfg.mapping.mode = MappingMode.GLOBAL
    cfg.mapping.estimation_type = est
    cfg.raycasting.enabled = raycast
    cfg.point_filter.range_max = 6.0
    geom = GridGeometry.from_length(40.0, 40.0, 0.1)
    s1, a1 = _run(geom, cfg, window_update=False)
    s2, a2 = _run(geom, cfg, window_update=None)  # auto -> windowed
    _assert_exact(s1, a1, s2, a2)


def test_local_big_map_windowed_exact():
    """LOCAL mode: the window is computed from the post-move position and
    the update runs after the roll — must match the full path including
    across moves."""
    cfg = Config()
    cfg.mapping.mode = MappingMode.LOCAL
    cfg.point_filter.range_max = 6.0
    cfg.raycasting.enabled = True
    geom = GridGeometry.from_length(40.0, 40.0, 0.1)
    s1, a1 = _run(geom, cfg, window_update=False, step_x=1.3)
    s2, a2 = _run(geom, cfg, window_update=None, step_x=1.3)
    _assert_exact(s1, a1, s2, a2)


def test_small_map_auto_stays_full():
    """Auto windowing must not engage when the window covers most of the
    map (the headline 15 m LOCAL config keeps its exact program)."""
    from fastdem_tpu.mapping import pipeline as pl

    cfg = Config()
    geom = GridGeometry.from_length(15.0, 15.0, 0.1)
    _, _, _, pab = pl._build_phases(
        geom, cfg, None, None, None, "rows", None
    )
    # rows mode + no window -> the batched harness stays available, which
    # doubles as the "windowed is off" indicator for this config.
    assert pab is not None


def test_small_ray_max_range_does_not_shrink_window():
    """raycasting.max_range bounds the polar ray FIELD only; the update
    window must derive from the point filter — a small max_range must not
    mask far points out of the rasterization (regression: the window was
    briefly sized from ray_max_range)."""
    cfg = Config()
    cfg.mapping.mode = MappingMode.GLOBAL
    cfg.point_filter.range_max = 6.0
    cfg.raycasting.enabled = True
    cfg.raycasting.max_range = 3.0  # << the point range
    geom = GridGeometry.from_length(40.0, 40.0, 0.1)
    s1, a1 = _run(geom, cfg, window_update=False)
    s2, a2 = _run(geom, cfg, window_update=None)
    _assert_exact(s1, a1, s2, a2)


def test_sensor_near_map_edge_windowed_exact():
    """Window clamping at the map boundary must not change results."""
    cfg = Config()
    cfg.mapping.mode = MappingMode.GLOBAL
    cfg.point_filter.range_max = 6.0
    cfg.raycasting.enabled = True
    geom = GridGeometry.from_length(40.0, 40.0, 0.1)
    s1, a1 = _run(geom, cfg, window_update=False, x0=-18.5, step_x=1.0)
    s2, a2 = _run(geom, cfg, window_update=None, x0=-18.5, step_x=1.0)
    _assert_exact(s1, a1, s2, a2)
