"""Sensor model tests (mirrors reference tests/test_sensor_models.cpp:
factory, symmetry/PSD, beam-direction variance, RGB-D structure, and the
fused z-variance hot path against the full-covariance reference path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdem_tpu.cloud import transform as tfm
from fastdem_tpu.config.config import (
    Config,
    SensorModelConfig,
    SensorType,
)
from fastdem_tpu.sensors.models import (
    ConstantModel,
    LiDARModel,
    RGBDModel,
    create_sensor_model,
)


class TestFactory:
    def test_types(self):
        cfg = SensorModelConfig()
        cfg.type = SensorType.LIDAR
        assert isinstance(create_sensor_model(cfg), LiDARModel)
        cfg.type = SensorType.RGBD
        assert isinstance(create_sensor_model(cfg), RGBDModel)
        cfg.type = SensorType.CONSTANT
        assert isinstance(create_sensor_model(cfg), ConstantModel)


class TestConstant:
    def test_isotropic(self):
        m = ConstantModel(0.1)
        cov = np.asarray(m.compute_covariances(jnp.ones((2, 3))))
        np.testing.assert_allclose(cov[0], np.eye(3) * 0.01, atol=1e-8)


class TestLiDAR:
    def setup_method(self):
        self.m = LiDARModel(range_noise=0.02, angular_noise=0.001)

    def test_symmetry_psd(self, rng):
        pts = rng.normal(scale=5.0, size=(50, 3)).astype(np.float32)
        cov = np.asarray(self.m.compute_covariances(jnp.asarray(pts)))
        np.testing.assert_allclose(cov, np.transpose(cov, (0, 2, 1)), atol=1e-7)
        eig = np.linalg.eigvalsh(cov)
        assert np.all(eig >= 0)

    def test_beam_direction_variance(self):
        # Variance along the beam equals sigma_r^2 (test_sensor_models.cpp:113)
        p = jnp.array([[3.0, 4.0, 0.0]])
        cov = np.asarray(self.m.compute_covariances(p))[0]
        d = np.array([0.6, 0.8, 0.0])
        var_beam = d @ cov @ d
        np.testing.assert_allclose(var_beam, 0.02**2, rtol=1e-5)

    def test_lateral_scales_with_distance(self):
        p1 = jnp.array([[1.0, 0, 0]])
        p2 = jnp.array([[10.0, 0, 0]])
        c1 = np.asarray(self.m.compute_covariances(p1))[0]
        c2 = np.asarray(self.m.compute_covariances(p2))[0]
        assert c2[1, 1] > c1[1, 1]

    def test_near_origin_fallback(self):
        cov = np.asarray(self.m.compute_covariances(jnp.zeros((1, 3))))[0]
        np.testing.assert_allclose(cov, np.eye(3) * 0.01)

    def test_fused_z_variance_matches_full(self, rng):
        pts = rng.normal(scale=5.0, size=(100, 3)).astype(np.float32)
        T = tfm.from_rpy(0.4, -0.3, 0.9)
        R = np.asarray(T[:3, :3])
        cov = np.asarray(self.m.compute_covariances(jnp.asarray(pts)))
        full = np.einsum("ij,njk,lk->nil", R, cov, R)[:, 2, 2]
        fused = np.asarray(
            self.m.z_variance_world(jnp.asarray(pts), jnp.asarray(R[2]))
        )
        np.testing.assert_allclose(fused, full, rtol=1e-4, atol=1e-9)


class TestRGBD:
    def setup_method(self):
        self.m = RGBDModel(0.001, 0.002, 0.4, 0.001)

    def test_diagonal_structure(self):
        cov = np.asarray(
            self.m.compute_covariances(jnp.array([[0.1, 0.1, 1.0]]))
        )[0]
        off = cov - np.diag(np.diag(cov))
        np.testing.assert_allclose(off, 0, atol=1e-10)

    def test_optimal_depth_minimizes_normal_noise(self):
        d = jnp.array([[0, 0, 0.4], [0, 0, 2.0]])
        cov = np.asarray(self.m.compute_covariances(d))
        assert cov[0, 2, 2] < cov[1, 2, 2]

    def test_depth_scaling(self):
        d = jnp.array([[0, 0, 1.0], [0, 0, 3.0]])
        cov = np.asarray(self.m.compute_covariances(d))
        assert cov[1, 0, 0] > cov[0, 0, 0]

    def test_invalid_depth_fallback(self):
        cov = np.asarray(
            self.m.compute_covariances(jnp.array([[0, 0, -1.0]]))
        )[0]
        np.testing.assert_allclose(cov, np.eye(3) * 0.01)

    def test_fused_z_variance_matches_full(self, rng):
        pts = np.abs(rng.normal(scale=2.0, size=(50, 3))).astype(np.float32)
        T = tfm.from_rpy(0.2, 0.1, -0.5)
        R = np.asarray(T[:3, :3])
        cov = np.asarray(self.m.compute_covariances(jnp.asarray(pts)))
        full = np.einsum("ij,njk,lk->nil", R, cov, R)[:, 2, 2]
        fused = np.asarray(
            self.m.z_variance_world(jnp.asarray(pts), jnp.asarray(R[2]))
        )
        np.testing.assert_allclose(fused, full, rtol=1e-4, atol=1e-10)
