"""Kalman estimator tests (mirrors reference tests/test_kalman_estimation.cpp:
first-measurement init, P clamping, bounds = +/-2 sigma_sample, R fallback
for var<=0, convergence, sample-variance independence from Kalman P)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdem_tpu.config.config import KalmanConfig
from fastdem_tpu.grid import gridmap
from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.grid.gridmap import layers
from fastdem_tpu.mapping import kalman


def make_state(shape=(4, 4)):
    geom = GridGeometry(rows=shape[0], cols=shape[1], resolution=0.1)
    fills = gridmap.default_layer_fills()
    fills.update(kalman.layer_fills())
    return geom, gridmap.create(geom, fills)


def obs_at(shape, cells, z, var=0.001):
    zmap = jnp.full(shape, jnp.nan)
    vmap_ = jnp.full(shape, jnp.nan)
    touched = jnp.zeros(shape, dtype=bool)
    for (r, c), zz in zip(cells, np.atleast_1d(z)):
        zmap = zmap.at[r, c].set(zz)
        vmap_ = vmap_.at[r, c].set(var)
        touched = touched.at[r, c].set(True)
    return zmap, vmap_, touched


CFG = KalmanConfig(min_variance=0.0001, max_variance=0.01, process_noise=0.0)


class TestKalman:
    def test_first_measurement_init(self):
        geom, state = make_state()
        z, v, t = obs_at(geom.shape, [(1, 1)], 1.5, var=0.004)
        state = kalman.update(state, CFG, z, v, t)
        assert float(state.layers[layers.elevation][1, 1]) == 1.5
        assert float(state.layers[layers.kalman_p][1, 1]) == pytest.approx(0.004)
        assert float(state.layers[layers.n_points][1, 1]) == 1.0
        # Untouched cell untouched.
        assert np.isnan(float(state.layers[layers.elevation][0, 0]))

    def test_variance_fallback_when_nonpositive(self):
        # R falls back to max_variance when measurement var <= 0 (:112-113).
        geom, state = make_state()
        z, v, t = obs_at(geom.shape, [(0, 0)], 2.0, var=0.0)
        state = kalman.update(state, CFG, z, v, t)
        assert float(state.layers[layers.kalman_p][0, 0]) == pytest.approx(
            CFG.max_variance
        )

    def test_p_shrinks_and_clamps(self):
        geom, state = make_state()
        for _ in range(50):
            z, v, t = obs_at(geom.shape, [(0, 0)], 1.0, var=0.002)
            state = kalman.update(state, CFG, z, v, t)
        P = float(state.layers[layers.kalman_p][0, 0])
        assert CFG.min_variance * (1 - 1e-5) <= P <= CFG.max_variance * (1 + 1e-5)

    def test_convergence_to_mean(self, rng):
        geom, state = make_state()
        vals = rng.normal(1.0, 0.05, size=200).astype(np.float32)
        for zz in vals:
            z, v, t = obs_at(geom.shape, [(0, 0)], float(zz), var=0.0025)
            state = kalman.update(state, CFG, z, v, t)
        x = float(state.layers[layers.elevation][0, 0])
        assert abs(x - 1.0) < 0.05

    def test_bounds_two_sigma_sample(self, rng):
        geom, state = make_state()
        vals = [0.9, 1.1, 1.0, 0.95, 1.05]
        for zz in vals:
            z, v, t = obs_at(geom.shape, [(0, 0)], zz, var=0.0025)
            state = kalman.update(state, CFG, z, v, t)
        svar = float(state.layers[layers.variance][0, 0])
        x = float(state.layers[layers.elevation][0, 0])
        up = float(state.layers[layers.upper_bound][0, 0])
        lo = float(state.layers[layers.lower_bound][0, 0])
        sigma = np.sqrt(max(0.0, svar))
        assert up == pytest.approx(x + 2 * sigma, rel=1e-5)
        assert lo == pytest.approx(x - 2 * sigma, rel=1e-5)

    def test_sample_variance_matches_numpy(self, rng):
        geom, state = make_state()
        vals = rng.normal(0.0, 0.3, size=30).astype(np.float32)
        for zz in vals:
            z, v, t = obs_at(geom.shape, [(0, 0)], float(zz), var=0.0025)
            state = kalman.update(state, CFG, z, v, t)
        svar = float(state.layers[layers.variance][0, 0])
        assert svar == pytest.approx(np.var(vals, ddof=1), rel=1e-3)

    def test_sample_variance_independent_of_kalman_p(self, rng):
        # Welford variance tracks data spread; Kalman P tracks filter
        # confidence (test_kalman_estimation.cpp:121).
        geom, state = make_state()
        vals = rng.normal(0.0, 1.0, size=100).astype(np.float32)
        for zz in vals:
            z, v, t = obs_at(geom.shape, [(0, 0)], float(zz), var=0.0025)
            state = kalman.update(state, CFG, z, v, t)
        svar = float(state.layers[layers.variance][0, 0])
        P = float(state.layers[layers.kalman_p][0, 0])
        assert svar > 0.5  # near 1.0
        assert P <= CFG.max_variance  # clamped small

    def test_process_noise_keeps_receptive(self):
        cfg = KalmanConfig(0.0001, 0.01, 0.001)
        geom, state = make_state()
        for _ in range(100):
            z, v, t = obs_at(geom.shape, [(0, 0)], 0.0, var=0.0025)
            state = kalman.update(state, cfg, z, v, t)
        # Jump: with Q > 0 the filter still moves noticeably.
        z, v, t = obs_at(geom.shape, [(0, 0)], 1.0, var=0.0025)
        state = kalman.update(state, cfg, z, v, t)
        assert float(state.layers[layers.elevation][0, 0]) > 0.1

    def test_scalar_recurrence_parity(self, rng):
        """Dense masked update equals the scalar recurrence run per cell."""
        cfg = KalmanConfig(0.0001, 0.01, 0.0005)
        geom, state = make_state((1, 1))
        vals = rng.normal(2.0, 0.2, size=25).astype(np.float32)
        vars_ = np.abs(rng.normal(0.003, 0.001, size=25)).astype(np.float32)

        # Independent scalar model of kalman_estimation.hpp:98-142.
        x = P = cnt = mean = m2 = sv = None
        for zz, vv in zip(vals, vars_):
            R = vv if vv > 0 else cfg.max_variance
            if x is None:
                x, P, cnt = zz, R, 1.0
            else:
                P += cfg.process_noise
                K = P / (P + R)
                x = x + K * (zz - x)
                P = np.clip((1 - K) * P, cfg.min_variance, cfg.max_variance)
                cnt += 1
            if mean is None:
                mean, sv, m2 = zz, 0.0, 0.0
            else:
                d = zz - mean
                nm = mean + d / cnt
                m2 += d * (zz - nm)
                sv = m2 / (cnt - 1) if cnt > 1 else 0.0
                mean = nm
            z, v, t = obs_at(geom.shape, [(0, 0)], float(zz), float(vv))
            state = kalman.update(state, cfg, z, v, t)

        assert float(state.layers[layers.elevation][0, 0]) == pytest.approx(
            x, rel=1e-5
        )
        assert float(state.layers[layers.kalman_p][0, 0]) == pytest.approx(
            P, rel=1e-4
        )
        assert float(state.layers[layers.variance][0, 0]) == pytest.approx(
            sv, rel=1e-3, abs=1e-7
        )
