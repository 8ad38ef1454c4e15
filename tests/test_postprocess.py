"""Post-processing tests (mirrors reference tests/test_postprocess.cpp:
inpainting fill/preserve, raycasting ghost clearing with log-odds
accumulation + observed-cell protection, UF bounds, smoothing spike removal,
feature extraction on flat/tilted planes; plus batched PCA vs numpy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdem_tpu.cloud.pca import compute_pca, eigh3x3
from fastdem_tpu.config.config import (
    Config,
    FeatureExtractionConfig,
    PostProcessConfig,
    RaycastingConfig,
    UncertaintyFusionConfig,
)
from fastdem_tpu.grid import gridmap
from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.grid.gridmap import layers
from fastdem_tpu.postprocess import (
    apply_postprocess_fn,
    apply_raycasting,
    extract_features,
    fuse_bounds,
    inpaint,
    smooth_median,
)


class TestPCA:
    def test_matches_numpy(self, rng):
        A = rng.normal(size=(20, 3, 3)).astype(np.float32)
        cov = np.einsum("nij,nkj->nik", A, A)  # PSD
        lam, vec = eigh3x3(jnp.asarray(cov))
        lam_np = np.linalg.eigvalsh(cov)
        np.testing.assert_allclose(np.asarray(lam), lam_np, rtol=1e-3, atol=1e-3)
        # Eigenvector property: A v = lambda v.
        for k in range(3):
            av = np.einsum("nij,nj->ni", cov, np.asarray(vec[..., k]))
            lv = np.asarray(lam[..., k])[:, None] * np.asarray(vec[..., k])
            np.testing.assert_allclose(av, lv, atol=2e-2)

    def test_degenerate_invalid(self):
        res = compute_pca(jnp.zeros((1, 3, 3)))
        assert not bool(res.valid[0])


class TestInpainting:
    def test_fills_small_hole(self):
        a = jnp.ones((10, 10))
        a = a.at[5, 5].set(jnp.nan)
        out = inpaint(a, max_iterations=3, min_valid_neighbors=2)
        assert float(out[5, 5]) == pytest.approx(1.0)

    def test_preserves_valid(self):
        a = jnp.ones((10, 10)).at[3, 3].set(7.0).at[5, 5].set(jnp.nan)
        out = inpaint(a)
        assert float(out[3, 3]) == 7.0

    def test_min_valid_neighbors(self):
        # Lone NaN island with only 1 finite neighbor: not filled at k=2.
        a = jnp.full((10, 10), jnp.nan).at[0, 0].set(1.0)
        out = inpaint(a, max_iterations=1, min_valid_neighbors=2)
        assert bool(jnp.isnan(out[0, 1]))

    def test_iterative_expansion(self):
        a = jnp.full((11, 11), jnp.nan)
        a = a.at[0, :].set(1.0).at[10, :].set(1.0)
        a = a.at[:, 0].set(1.0).at[:, 10].set(1.0)
        out = inpaint(a, max_iterations=10, min_valid_neighbors=2)
        assert bool(jnp.all(jnp.isfinite(out)))
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


class TestSmoothing:
    def test_spike_removed(self):
        a = jnp.zeros((9, 9)).at[4, 4].set(10.0)
        out = smooth_median(a, 3, 5)
        assert float(out[4, 4]) == 0.0

    def test_edge_preserved(self):
        a = jnp.concatenate(
            [jnp.zeros((9, 4)), jnp.ones((9, 5))], axis=1
        )
        out = smooth_median(a, 3, 5)
        # A step edge survives a median filter.
        assert float(out[4, 3]) == 0.0
        assert float(out[4, 5]) == 1.0

    def test_insufficient_neighbors_untouched(self):
        a = jnp.full((9, 9), jnp.nan).at[4, 4].set(3.0)
        out = smooth_median(a, 3, 5)
        assert float(out[4, 4]) == 3.0


class TestUncertaintyFusion:
    def test_bounds_tighten_toward_confident_neighbors(self):
        H = W = 9
        # Very confident neighbors (range 0.01 -> large inverse-range
        # weight); the wide center's weight fraction drops below the 1%
        # quantile tail and its extreme bounds are replaced.
        upper = jnp.full((H, W), 1.005)
        lower = jnp.full((H, W), 0.995)
        upper = upper.at[4, 4].set(5.0)
        lower = lower.at[4, 4].set(-5.0)
        cfg = UncertaintyFusionConfig(enabled=True)
        up, lo = fuse_bounds(upper, lower, cfg, resolution=0.1)
        assert float(up[4, 4]) < 1.1
        assert float(lo[4, 4]) > 0.9

    def test_invalid_center_untouched(self):
        upper = jnp.full((9, 9), jnp.nan)
        lower = jnp.full((9, 9), jnp.nan)
        cfg = UncertaintyFusionConfig(enabled=True)
        up, lo = fuse_bounds(upper, lower, cfg, 0.1)
        assert bool(jnp.all(jnp.isnan(up)))

    def test_quantiles_of_uniform_field(self):
        upper = jnp.full((9, 9), 2.0)
        lower = jnp.full((9, 9), 1.0)
        cfg = UncertaintyFusionConfig(enabled=True)
        up, lo = fuse_bounds(upper, lower, cfg, 0.1)
        np.testing.assert_allclose(np.asarray(up), 2.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lo), 1.0, atol=1e-6)


class TestFeatureExtraction:
    CFG = FeatureExtractionConfig(enabled=True, analysis_radius=0.3)

    def test_flat_plane(self):
        elev = jnp.zeros((15, 15))
        f = extract_features(elev, self.CFG, 0.1)
        ok = np.asarray(f["ok"])
        assert ok[7, 7]
        assert float(f["slope"][7, 7]) == pytest.approx(0.0, abs=0.5)
        assert float(f["roughness"][7, 7]) == pytest.approx(0.0, abs=1e-3)
        assert float(f["normal_z"][7, 7]) == pytest.approx(1.0, abs=1e-3)
        assert float(f["step"][7, 7]) == pytest.approx(0.0, abs=1e-6)

    def test_tilted_plane_slope(self):
        geom = GridGeometry.from_length(1.5, 1.5, 0.1)
        rr = jnp.arange(15, dtype=jnp.float32)
        # z = x * tan(30 deg); x = -(row * res) up to constant.
        slope_rad = np.deg2rad(30.0)
        x = -(rr * 0.1)
        elev = jnp.broadcast_to(
            (x * np.tan(slope_rad))[:, None], (15, 15)
        )
        f = extract_features(elev, self.CFG, 0.1)
        assert float(f["slope"][7, 7]) == pytest.approx(30.0, abs=1.0)
        # Normal flipped upward.
        assert float(f["normal_z"][7, 7]) > 0

    def test_step_detection(self):
        elev = jnp.concatenate(
            [jnp.zeros((15, 7)), jnp.ones((15, 8))], axis=1
        )
        f = extract_features(elev, self.CFG, 0.1)
        assert float(f["step"][7, 7]) == pytest.approx(1.0, abs=1e-5)

    def test_nan_center_skipped(self):
        elev = jnp.zeros((15, 15)).at[7, 7].set(jnp.nan)
        f = extract_features(elev, self.CFG, 0.1)
        assert not bool(f["ok"][7, 7])


def _ray_state(geom, cfg):
    from fastdem_tpu.mapping.pipeline import create_map_state

    return create_map_state(geom, cfg)


class TestRaycasting:
    def make(self):
        geom = GridGeometry.from_length(10.0, 10.0, 0.1)
        cfg = Config()
        cfg.raycasting.enabled = True
        state = _ray_state(geom, cfg)
        return geom, cfg, state

    def put_elev(self, geom, state, xy, z):
        r, c, _ = geom.index_of(state.position, jnp.asarray(xy))
        return state.replace_layer(
            layers.elevation,
            state.layers[layers.elevation].at[int(r), int(c)].set(z),
        ), (int(r), int(c))

    def test_ghost_cleared_after_accumulation(self):
        geom, cfg, state = self.make()
        # Phantom obstacle at (2, 0), height 1.0; rays pass near the ground
        # beneath it toward a far point.
        # Scene sits off the y=0 gridline (a ray exactly along a cell
        # boundary is a knife-edge crossing; the DDA's side choice there
        # is arbitrary): obstacle cell centered (1.95, -0.05), ray
        # through it toward (4, -0.1).
        state, (r, c) = self.put_elev(geom, state, [1.95, -0.05], 1.0)
        origin = jnp.array([0.0, 0.0, 0.5])
        target = jnp.array([[4.0, -0.1, 0.0]])  # passes the cell at z~0.26
        mask = jnp.ones(1, dtype=bool)
        rc = cfg.raycasting
        # log_odds_ghost=0.2, clear at < -1.0: needs several scans.
        for i in range(10):
            state = apply_raycasting(geom, state, target, mask, origin, rc)
        assert bool(jnp.isnan(state.layers[layers.elevation][r, c]))
        assert float(state.layers[layers.ghost_removal][r, c]) == 1.0

    def test_single_pass_does_not_clear(self):
        geom, cfg, state = self.make()
        state, (r, c) = self.put_elev(geom, state, [1.95, -0.05], 1.0)
        origin = jnp.array([0.0, 0.0, 0.5])
        target = jnp.array([[4.0, -0.1, 0.0]])
        state = apply_raycasting(
            geom, state, target, jnp.ones(1, bool), origin, cfg.raycasting
        )
        assert float(state.layers[layers.elevation][r, c]) == 1.0

    def test_observed_cells_protected(self):
        # A cell that keeps receiving points accumulates +log_odds_observed
        # faster than ghosts decay it (test_postprocess.cpp:117).
        geom, cfg, state = self.make()
        state, (r, c) = self.put_elev(geom, state, [1.95, -0.05], 1.0)
        origin = jnp.array([0.0, 0.0, 0.5])
        pts = jnp.array([[1.95, -0.05, 1.0], [4.0, -0.1, 0.0]])
        mask = jnp.ones(2, dtype=bool)
        for _ in range(20):
            state = apply_raycasting(
                geom, state, pts, mask, origin, cfg.raycasting
            )
        assert float(state.layers[layers.elevation][r, c]) == 1.0

    def test_ray_below_elevation_no_conflict(self):
        # Recorded elevation BELOW the ray: no conflict, nothing cleared.
        geom, cfg, state = self.make()
        state, (r, c) = self.put_elev(geom, state, [2.0, 0.0], -1.0)
        origin = jnp.array([0.0, 0.0, 0.5])
        target = jnp.array([[4.0, 0.0, 0.0]])
        for _ in range(10):
            state = apply_raycasting(
                geom, state, target, jnp.ones(1, bool), origin, cfg.raycasting
            )
        assert float(state.layers[layers.elevation][r, c]) == -1.0

    def test_origin_outside_map_noop(self):
        geom, cfg, state = self.make()
        state, (r, c) = self.put_elev(geom, state, [2.0, 0.0], 1.0)
        origin = jnp.array([50.0, 0.0, 0.5])
        target = jnp.array([[4.0, 0.0, 0.0]])
        out = apply_raycasting(
            geom, state, target, jnp.ones(1, bool), origin, cfg.raycasting
        )
        # No observed evidence recorded anywhere.
        assert bool(jnp.all(jnp.isnan(out.layers[layers.visibility_logodds])))


class TestPostprocessChain:
    def test_chain_runs(self, rng):
        geom = GridGeometry.from_length(5.0, 5.0, 0.1)
        cfg = PostProcessConfig()
        cfg.inpainting.enabled = True
        cfg.uncertainty_fusion.enabled = True
        cfg.feature_extraction.enabled = True
        fn = apply_postprocess_fn(geom, cfg)
        elev = jnp.asarray(
            rng.normal(0, 0.05, size=geom.shape).astype(np.float32)
        ).at[10, 10].set(jnp.nan)
        up = elev + 0.1
        lo = elev - 0.1
        out = fn(elev, up, lo)
        assert bool(jnp.isfinite(out["elevation"][10, 10]))
        assert "slope" in out and "uncertainty_range" in out


class TestWindowedRaycast:
    """Large global map + range-limited sensor: the raycast resample runs
    in a sensor-centered window; ghost removal works inside it, cells
    beyond the ray range see no ray evidence."""

    def test_ghost_cleared_in_window(self):
        import fastdem_tpu as fd
        from fastdem_tpu.cloud import pointcloud as pcm

        geom = GridGeometry.from_length(60.0, 60.0, 0.25)  # 240x240 cells
        cfg = Config()
        cfg.mapping.mode = fd.MappingMode.GLOBAL
        cfg.raycasting.enabled = True
        cfg.point_filter.range_max = 8.0  # window ~64+4 cells < 240
        m = fd.FastDEM(geom, cfg)
        I4 = np.eye(4, dtype=np.float32)
        T_bs = np.eye(4, dtype=np.float32)
        T_bs[2, 3] = 0.5

        # Seed a phantom obstacle at (2, 0) height 1.0.
        r, c, _ = geom.index_of(
            m.state.position, jnp.asarray([1.875, -0.125])
        )
        r, c = int(r), int(c)
        m.state = m.state.replace_layer(
            layers.elevation, m.state.layers[layers.elevation].at[r, c].set(1.0)
        )
        # Rays to a far point pass under the phantom each scan (scene off
        # the y=0 gridline — cell-boundary rays are knife-edge crossings).
        target = pcm.from_numpy(
            np.array([[6.0, -0.4, -0.5]], dtype=np.float32)
        )
        for _ in range(12):
            assert m.integrate(target, T_bs, I4)
        assert bool(jnp.isnan(m.state.layers[layers.elevation][r, c]))
        assert float(m.state.layers[layers.ghost_removal][r, c]) == 1.0

    def test_outside_window_untouched(self):
        import fastdem_tpu as fd
        from fastdem_tpu.cloud import pointcloud as pcm

        geom = GridGeometry.from_length(60.0, 60.0, 0.25)
        cfg = Config()
        cfg.mapping.mode = fd.MappingMode.GLOBAL
        cfg.raycasting.enabled = True
        cfg.point_filter.range_max = 8.0
        m = fd.FastDEM(geom, cfg)
        I4 = np.eye(4, dtype=np.float32)
        T_bs = np.eye(4, dtype=np.float32)
        T_bs[2, 3] = 0.5
        # Obstacle far beyond the ray range: no ray can reach it.
        r, c, _ = geom.index_of(m.state.position, jnp.asarray([25.0, 0.0]))
        r, c = int(r), int(c)
        m.state = m.state.replace_layer(
            layers.elevation, m.state.layers[layers.elevation].at[r, c].set(1.0)
        )
        target = pcm.from_numpy(
            np.array([[6.0, 0.0, -0.5]], dtype=np.float32)
        )
        for _ in range(12):
            m.integrate(target, T_bs, I4)
        assert float(m.state.layers[layers.elevation][r, c]) == 1.0
