"""P^2 quantile estimator tests (mirrors reference
tests/test_quantile_estimation.cpp: <5-sample passthrough, activation at 5,
marker monotonicity, normal-distribution quantile accuracy, bounds) plus a
step-by-step parity check against an independent scalar implementation of
the published algorithm (Jain & Chlamtac 1985)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdem_tpu.config.config import P2Config
from fastdem_tpu.grid import gridmap
from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.grid.gridmap import layers
from fastdem_tpu.mapping import p2


def make_state(shape=(2, 2)):
    geom = GridGeometry(rows=shape[0], cols=shape[1], resolution=0.1)
    fills = gridmap.default_layer_fills()
    fills.update(p2.layer_fills())
    return geom, gridmap.create(geom, fills)


def feed(state, cfg, cell, values, bounds=True):
    shape = state.layers[layers.elevation].shape
    for v in values:
        z = jnp.full(shape, jnp.nan).at[cell].set(float(v))
        t = jnp.zeros(shape, dtype=bool).at[cell].set(True)
        if bounds:
            state = p2.estimate(state, cfg, z, z, t)
        else:
            state = p2.update(state, cfg, z, z, t)
    return state


class ScalarP2:
    """Independent scalar P^2 (from the 1985 paper, with FastDEM's phase-1
    and fading-memory conventions) used as a test oracle."""

    def __init__(self, dn, max_count=0.0):
        self.dn = list(dn)
        self.q = [np.nan] * 5
        self.n = [0.0, 1.0, 2.0, 3.0, 4.0]
        self.count = 0.0
        self.max_count = max_count

    def add(self, x):
        if self.count < 5:
            self.q[int(self.count)] = x
            self.count += 1
            if self.count >= 5:
                self.q.sort()
                self.n = [float(i) for i in range(5)]
            return
        if x < self.q[0]:
            self.q[0] = x
            k = 0
        elif x < self.q[1]:
            k = 0
        elif x < self.q[2]:
            k = 1
        elif x < self.q[3]:
            k = 2
        elif x <= self.q[4]:
            k = 3
        else:
            self.q[4] = x
            k = 3
        for i in range(k + 1, 5):
            self.n[i] += 1
        n_prime = [d * self.count for d in self.dn]
        self.count += 1
        if self.max_count > 0 and self.count > self.max_count:
            s = self.max_count / self.count
            self.n = [v * s for v in self.n]
            self.count = self.max_count
        q, n = self.q, self.n
        for i in (1, 2, 3):
            d = n_prime[i] - n[i]
            if (d >= 1 and n[i + 1] - n[i] > 1) or (
                d <= -1 and n[i - 1] - n[i] < -1
            ):
                s = 1 if d >= 0 else -1
                dr, dl, ds = n[i + 1] - n[i], n[i] - n[i - 1], n[i + 1] - n[i - 1]
                if dr == 0 or dl == 0 or ds == 0:
                    qp = q[i]
                else:
                    t1 = (dl + s) * (q[i + 1] - q[i]) / dr
                    t2 = (dr - s) * (q[i] - q[i - 1]) / dl
                    qp = q[i] + s * (t1 + t2) / ds
                if q[i - 1] < qp < q[i + 1]:
                    q[i] = qp
                else:
                    j = i + s
                    dn_ = n[j] - n[i]
                    q[i] = q[i] if dn_ == 0 else q[i] + s * (q[j] - q[i]) / dn_
                n[i] += s


CFG = P2Config()


class TestP2:
    def test_phase1_insertion(self):
        geom, state = make_state()
        state = feed(state, CFG, (0, 0), [3.0, 1.0, 2.0], bounds=False)
        assert float(state.layers[layers.n_points][0, 0]) == 3.0
        # Elevation passthrough before 5 samples (update only).
        assert float(state.layers[layers.elevation][0, 0]) == 2.0

    def test_activation_sorts_markers(self):
        geom, state = make_state()
        state = feed(state, CFG, (0, 0), [5.0, 1.0, 3.0, 2.0, 4.0], bounds=False)
        q = [float(state.layers[name][0, 0]) for name in layers.p2_q]
        assert q == [1.0, 2.0, 3.0, 4.0, 5.0]
        n = [float(state.layers[name][0, 0]) for name in layers.p2_n]
        assert n == [0.0, 1.0, 2.0, 3.0, 4.0]

    def test_markers_monotonic(self, rng):
        geom, state = make_state()
        vals = rng.normal(0.0, 1.0, size=100)
        state = feed(state, CFG, (0, 0), vals)
        q = [float(state.layers[name][0, 0]) for name in layers.p2_q]
        assert all(q[i] <= q[i + 1] + 1e-6 for i in range(4))

    def test_median_of_normal(self, rng):
        cfg = P2Config(elevation_marker=2)
        geom, state = make_state()
        vals = rng.normal(2.0, 0.5, size=500)
        state = feed(state, cfg, (0, 0), vals)
        med = float(state.layers[layers.elevation][0, 0])
        assert abs(med - 2.0) < 0.1

    def test_bounds_are_extreme_markers(self, rng):
        geom, state = make_state()
        vals = rng.normal(0.0, 1.0, size=50)
        state = feed(state, CFG, (0, 0), vals)
        q0 = float(state.layers[layers.p2_q[0]][0, 0])
        q4 = float(state.layers[layers.p2_q[4]][0, 0])
        assert float(state.layers[layers.lower_bound][0, 0]) == q0
        assert float(state.layers[layers.upper_bound][0, 0]) == q4

    def test_variance_from_sigma_markers(self, rng):
        geom, state = make_state()
        vals = rng.normal(0.0, 1.0, size=300)
        state = feed(state, CFG, (0, 0), vals)
        q1 = float(state.layers[layers.p2_q[1]][0, 0])
        q3 = float(state.layers[layers.p2_q[3]][0, 0])
        v = float(state.layers[layers.variance][0, 0])
        assert v == pytest.approx(((q3 - q1) / 2) ** 2, rel=1e-5)
        # For N(0,1), (q84-q16)/2 ~ 1.
        assert 0.6 < np.sqrt(v) < 1.4

    def test_scalar_parity(self, rng):
        """Exact step parity vs the independent scalar oracle."""
        geom, state = make_state((1, 1))
        vals = rng.normal(0.0, 1.0, size=200).astype(np.float32)
        oracle = ScalarP2([CFG.dn0, CFG.dn1, CFG.dn2, CFG.dn3, CFG.dn4])
        for v in vals:
            oracle.add(float(v))
        state = feed(state, CFG, (0, 0), vals)
        q = [float(state.layers[name][0, 0]) for name in layers.p2_q]
        n = [float(state.layers[name][0, 0]) for name in layers.p2_n]
        np.testing.assert_allclose(q, oracle.q, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(n, oracle.n, rtol=1e-5)
        assert float(state.layers[layers.n_points][0, 0]) == oracle.count

    def test_scalar_parity_fading_memory(self, rng):
        cfg = P2Config(max_sample_count=50.0)
        geom, state = make_state((1, 1))
        vals = rng.normal(0.0, 1.0, size=150).astype(np.float32)
        oracle = ScalarP2(
            [cfg.dn0, cfg.dn1, cfg.dn2, cfg.dn3, cfg.dn4], max_count=50.0
        )
        for v in vals:
            oracle.add(float(v))
        state = feed(state, cfg, (0, 0), vals)
        q = [float(state.layers[name][0, 0]) for name in layers.p2_q]
        np.testing.assert_allclose(q, oracle.q, rtol=1e-3, atol=1e-4)
        assert float(state.layers[layers.n_points][0, 0]) == pytest.approx(
            oracle.count
        )

    def test_independent_cells(self, rng):
        geom, state = make_state((2, 2))
        a = rng.normal(0.0, 0.1, size=60)
        b = rng.normal(5.0, 0.1, size=60)
        shape = geom.shape
        for va, vb in zip(a, b):
            z = (
                jnp.full(shape, jnp.nan)
                .at[0, 0].set(float(va))
                .at[1, 1].set(float(vb))
            )
            t = jnp.zeros(shape, dtype=bool).at[0, 0].set(True).at[1, 1].set(True)
            state = p2.estimate(state, CFG, z, z, t)
        e00 = float(state.layers[layers.elevation][0, 0])
        e11 = float(state.layers[layers.elevation][1, 1])
        assert abs(e00 - 0.0) < 0.5
        assert abs(e11 - 5.0) < 0.5
