"""Unit tests for the irregular-op kernels: tile-row gather and the Pallas
polar-field kernel (interpret mode).

These back the perf-critical restructurings measured in
tools/bench_perop.py / bench_rowgather2.py (tile-row gathers ~5x faster
than element gathers on TPU) — correctness here is exactness vs the
plain formulations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.ops import rowgather
from fastdem_tpu.ops.pallas_polar import polar_smeared_field_pallas
from fastdem_tpu.ops.rowgather import tile_row_gather
from fastdem_tpu.postprocess.raycasting import (
    polar_dims,
    polar_smeared_field,
)


class TestTileRowGather:
    def test_f32_exact(self, rng):
        buf = jnp.asarray(rng.random(30_000).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 30_000, 22_500).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(tile_row_gather(buf, idx)),
            np.asarray(buf)[np.asarray(idx)],
        )

    def test_int32_bitpatterns_and_shape(self, rng):
        # Arbitrary bit patterns (packed colors, bitcast indices) must pass
        # through exactly; idx shape is preserved.
        buf = jnp.asarray(
            rng.integers(-(2**31), 2**31 - 1, 1000).astype(np.int32)
        )
        idx = jnp.asarray(
            rng.integers(0, 1000, (40, 25)).astype(np.int32)
        )
        out = tile_row_gather(buf, idx)
        assert out.shape == (40, 25)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(buf)[np.asarray(idx)]
        )

    def test_nonmultiple_of_128_buffer(self, rng):
        buf = jnp.asarray(rng.random(131).astype(np.float32))
        idx = jnp.asarray(np.asarray([0, 1, 127, 128, 130], np.int32))
        np.testing.assert_array_equal(
            np.asarray(tile_row_gather(buf, idx)),
            np.asarray(buf)[np.asarray(idx)],
        )

    def test_nan_inf_payloads(self):
        buf = jnp.asarray(
            np.asarray([np.nan, np.inf, -np.inf, 0.0, -0.0], np.float32)
        )
        idx = jnp.asarray(np.asarray([0, 1, 2, 3, 4], np.int32))
        out = np.asarray(tile_row_gather(buf, idx))
        assert np.isnan(out[0]) and np.isposinf(out[1]) and np.isneginf(out[2])
        # -0.0 bit pattern preserved (int32 path).
        assert np.signbit(out[4])

    def test_kill_switch_equivalent(self, rng):
        buf = jnp.asarray(rng.random(500).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 500, 64).astype(np.int32))
        want = np.asarray(buf)[np.asarray(idx)]
        try:
            rowgather.set_enabled(False)
            np.testing.assert_array_equal(
                np.asarray(tile_row_gather(buf, idx)), want
            )
        finally:
            rowgather.set_enabled(True)
        np.testing.assert_array_equal(
            np.asarray(tile_row_gather(buf, idx)), want
        )

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError, match="flat"):
            tile_row_gather(jnp.zeros((2, 2)), jnp.zeros(2, jnp.int32))
        with pytest.raises(ValueError, match="4-byte"):
            tile_row_gather(
                jnp.zeros(4, jnp.float16), jnp.zeros(2, jnp.int32)
            )


class TestPallasPolarField:
    @pytest.mark.parametrize(
        "num_az,rbf,maxr,exact",
        [
            (2048, 0.25, 12.81, True),
            (1024, 0.5, 9.0, True),
            (2048, 0.25, 12.81, False),
        ],
    )
    def test_matches_xla_path(self, rng, num_az, rbf, maxr, exact):
        """Interpret-mode kernel vs the XLA formulation: identical finite
        sets; values to f32-FMA-contraction tolerance (the affine
        h = z0 + slope*d evaluation may or may not contract)."""
        geom = GridGeometry.from_length(15.0, 15.0, 0.1)
        A, R, dr = polar_dims(geom, num_az, rbf, maxr)
        tbl = rng.uniform(-2.0, 0.5, R * A).astype(np.float32)
        tbl[rng.random(R * A) < 0.97] = np.inf
        so = jnp.asarray([0.07, -0.03, 1.2], dtype=jnp.float32)
        ref = np.asarray(
            polar_smeared_field(
                geom, so, jnp.asarray(tbl), num_az, rbf, maxr,
                exact_window=exact,
            )
        )
        out = np.asarray(
            polar_smeared_field_pallas(
                geom, so, jnp.asarray(tbl), num_az, rbf, maxr,
                exact_window=exact, interpret=True,
            )
        )
        assert out.shape == ref.shape
        np.testing.assert_array_equal(
            np.isfinite(ref), np.isfinite(out)
        )
        both = np.isfinite(ref)
        np.testing.assert_allclose(
            out[both], ref[both], rtol=0, atol=4e-6
        )

    def test_rejects_unaligned_azimuth(self, rng):
        geom = GridGeometry.from_length(6.0, 6.0, 0.1)
        with pytest.raises(ValueError, match="multiple of 128"):
            polar_smeared_field_pallas(
                geom,
                jnp.zeros(3),
                jnp.zeros(polar_dims(geom, 100, 0.5, None)[1] * 100),
                100,
                0.5,
                None,
                interpret=True,
            )
