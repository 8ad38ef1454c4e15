"""Segmentation tests (behavior level of nanoPCL segmentation suite)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdem_tpu.cloud import pointcloud as pc
from fastdem_tpu.cloud import segmentation as segm


class TestRansacPlane:
    def test_finds_dominant_plane(self, rng):
        n = 800
        plane = np.column_stack(
            [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
             rng.normal(0, 0.01, n)]
        )
        noise = rng.uniform(-2, 2, size=(120, 3))
        noise[:, 2] = rng.uniform(0.5, 2.0, 120)
        pts = np.vstack([plane, noise]).astype(np.float32)
        cloud = pc.from_numpy(pts)
        res = segm.segment_plane(cloud, distance_threshold=0.05)
        assert res.fitness > 0.7
        coef = np.asarray(res.model.coefficients)
        assert abs(abs(coef[2]) - 1.0) < 0.05  # normal ~ +-z
        inl = np.asarray(res.inliers)
        assert inl[:n].mean() > 0.95
        assert inl[n:].mean() < 0.1

    def test_tilted_plane(self, rng):
        n = 600
        x = rng.uniform(-2, 2, n)
        y = rng.uniform(-2, 2, n)
        z = 0.5 * x + rng.normal(0, 0.01, n)
        pts = np.column_stack([x, y, z]).astype(np.float32)
        res = segm.segment_plane(pc.from_numpy(pts), 0.05)
        coef = np.asarray(res.model.coefficients)
        # Plane z = 0.5x -> normal ~ (-0.5, 0, 1)/|.|
        expected = np.array([-0.5, 0.0, 1.0])
        expected /= np.linalg.norm(expected)
        align = abs(np.dot(coef[:3], expected))
        assert align > 0.99


class TestEuclideanCluster:
    def test_two_blobs(self, rng):
        a = rng.normal(0, 0.1, size=(100, 3))
        b = rng.normal(0, 0.1, size=(80, 3)) + np.array([5.0, 0, 0])
        cloud = pc.from_numpy(np.vstack([a, b]).astype(np.float32))
        labels = np.asarray(segm.euclidean_cluster(cloud, tolerance=0.5))
        la = set(labels[:100].tolist())
        lb = set(labels[100:].tolist())
        assert len(la) == 1 and len(lb) == 1
        assert la != lb

    def test_min_cluster_size(self, rng):
        a = rng.normal(0, 0.1, size=(100, 3))
        lone = np.array([[50.0, 50.0, 50.0]])
        cloud = pc.from_numpy(np.vstack([a, lone]).astype(np.float32))
        labels = np.asarray(
            segm.euclidean_cluster(cloud, tolerance=0.5, min_cluster_size=5)
        )
        assert labels[100] == -1
        assert (labels[:100] >= 0).all()

    def test_chain_connectivity(self):
        # A chain of points each within tolerance of the next.
        pts = np.column_stack(
            [np.arange(20) * 0.4, np.zeros(20), np.zeros(20)]
        ).astype(np.float32)
        cloud = pc.from_numpy(pts)
        labels = np.asarray(segm.euclidean_cluster(cloud, tolerance=0.5))
        assert len(set(labels.tolist())) == 1


class TestGroundSeg:
    def test_flat_ground_with_obstacles(self, rng):
        n = 1500
        ground = np.column_stack(
            [rng.uniform(-5, 5, n), rng.uniform(-5, 5, n),
             rng.normal(0, 0.02, n)]
        )
        boxes = np.column_stack(
            [rng.uniform(-1, 1, 200), rng.uniform(-1, 1, 200),
             rng.uniform(0.8, 1.5, 200)]
        )
        pts = np.vstack([ground, boxes]).astype(np.float32)
        cloud = pc.from_numpy(pts)
        mask = np.asarray(segm.segment_ground(cloud))
        assert mask[:n].mean() > 0.9
        assert mask[n:].mean() < 0.05

    def test_sloped_terrain(self, rng):
        # Grid segmentation handles slopes that break a single RANSAC plane
        # ... within the max_ground_height gate.
        n = 1200
        x = rng.uniform(-3, 3, n)
        y = rng.uniform(-3, 3, n)
        z = 0.05 * x + rng.normal(0, 0.01, n)
        pts = np.column_stack([x, y, z]).astype(np.float32)
        cloud = pc.from_numpy(pts)
        cfg = segm.GroundSegConfig(max_ground_height=1.0)
        mask = np.asarray(segm.segment_ground(cloud, cfg))
        assert mask.mean() > 0.8
