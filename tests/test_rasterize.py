"""Rasterization tests (mirrors reference tests/test_rasterization.cpp at
behavior level: min/max/mean reductions, per-cell variance, counts; plus
min-z-variance carry and tie semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.mapping import rasterize as R


GEOM = GridGeometry.from_length(2.0, 2.0, 1.0)  # 2x2 cells centered at 0
POS = jnp.zeros(2)


def raster(xyz, var=None, mask=None, **kw):
    xyz = jnp.asarray(xyz, dtype=jnp.float32)
    n = xyz.shape[0]
    if var is None:
        var = jnp.full(n, 0.01, dtype=jnp.float32)
    if mask is None:
        mask = jnp.ones(n, dtype=bool)
    return R.rasterize(GEOM, POS, xyz, mask, jnp.asarray(var), **kw)


class TestRasterize:
    def test_min_max_per_cell(self):
        # Cell (0,0) covers x in (0, 1], y in (0, 1].
        obs = raster([[0.5, 0.5, 1.0], [0.5, 0.5, 3.0], [0.6, 0.4, 2.0]])
        assert float(obs.min_z[0, 0]) == 1.0
        assert float(obs.max_z[0, 0]) == 3.0
        assert bool(obs.touched[0, 0])
        assert not bool(obs.touched[1, 1])
        assert np.isnan(float(obs.min_z[1, 1]))

    def test_min_var_carried_from_min_point(self):
        obs = raster(
            [[0.5, 0.5, 2.0], [0.5, 0.5, 1.0]], var=[0.111, 0.222]
        )
        assert float(obs.min_z_var[0, 0]) == pytest.approx(0.222)

    def test_tie_takes_smaller_variance(self):
        obs = raster([[0.5, 0.5, 1.0], [0.5, 0.5, 1.0]], var=[0.3, 0.1])
        assert float(obs.min_z_var[0, 0]) == pytest.approx(0.1)

    def test_masked_points_ignored(self):
        obs = raster(
            [[0.5, 0.5, 1.0], [0.5, 0.5, -5.0]],
            mask=jnp.array([True, False]),
        )
        assert float(obs.min_z[0, 0]) == 1.0

    def test_out_of_map_ignored(self):
        obs = raster([[10.0, 10.0, 1.0]])
        assert not bool(jnp.any(obs.touched))

    def test_intensity_max_pool(self):
        obs = raster(
            [[0.5, 0.5, 1.0], [0.5, 0.5, 2.0]],
            intensity=jnp.array([3.0, 7.0]),
        )
        assert float(obs.max_intensity[0, 0]) == 7.0

    def test_quadrants(self):
        # row/col axes: +x -> row 0, -x -> row 1; +y -> col 0, -y -> col 1.
        obs = raster(
            [
                [0.5, 0.5, 1.0],
                [-0.5, 0.5, 2.0],
                [0.5, -0.5, 3.0],
                [-0.5, -0.5, 4.0],
            ]
        )
        assert float(obs.min_z[0, 0]) == 1.0
        assert float(obs.min_z[1, 0]) == 2.0
        assert float(obs.min_z[0, 1]) == 3.0
        assert float(obs.min_z[1, 1]) == 4.0


class TestRasterizeStats:
    def test_count_mean_var(self, rng):
        zs = rng.normal(2.0, 0.5, size=40).astype(np.float32)
        xyz = np.column_stack(
            [np.full(40, 0.5), np.full(40, 0.5), zs]
        ).astype(np.float32)
        stats = R.rasterize_stats(
            GEOM, POS, jnp.asarray(xyz), jnp.ones(40, bool)
        )
        assert float(stats.count[0, 0]) == 40
        assert float(stats.mean[0, 0]) == pytest.approx(zs.mean(), rel=1e-4)
        assert float(stats.variance[0, 0]) == pytest.approx(
            np.var(zs, ddof=1), rel=1e-3
        )
        assert float(stats.min_z[0, 0]) == pytest.approx(zs.min())
        assert float(stats.max_z[0, 0]) == pytest.approx(zs.max())

    def test_single_point_zero_variance(self):
        stats = R.rasterize_stats(
            GEOM, POS, jnp.asarray([[0.5, 0.5, 1.0]]), jnp.ones(1, bool)
        )
        assert float(stats.variance[0, 0]) == 0.0
