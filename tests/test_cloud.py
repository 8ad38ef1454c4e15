"""PointCloud container, transform, and filter tests (mirrors nanoPCL's
pointcloud/transform/filters/voxel suites at the behavior level)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdem_tpu.cloud import filters as F
from fastdem_tpu.cloud import pointcloud as pc
from fastdem_tpu.cloud import transform as tfm


def cube_cloud(n=5):
    g = np.linspace(-1, 1, n)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    return pc.from_numpy(pts)


class TestPointCloud:
    def test_from_numpy_pads_and_masks(self):
        cloud = pc.from_numpy(np.zeros((3, 3)), capacity=8)
        assert cloud.capacity == 8
        assert cloud.count() == 3

    def test_nan_points_invalid(self):
        xyz = np.array([[0, 0, 0], [np.nan, 0, 0], [1, 1, 1]], dtype=np.float32)
        cloud = pc.from_numpy(xyz)
        assert cloud.count() == 2

    def test_compact(self):
        cloud = cube_cloud()
        cloud = F.crop_z(cloud, 0.0, 2.0)
        exact = pc.compact(cloud)
        assert exact.capacity == exact.count() == cloud.count()

    def test_channels(self):
        cloud = pc.from_numpy(
            np.zeros((4, 3)), intensity=np.arange(4, dtype=np.float32)
        )
        assert cloud.has("intensity")
        np.testing.assert_allclose(
            np.asarray(cloud.channels["intensity"]), [0, 1, 2, 3]
        )

    def test_merge(self):
        a = pc.from_numpy(np.zeros((2, 3)), intensity=np.ones(2, np.float32))
        b = pc.from_numpy(np.ones((3, 3)))
        m = pc.merge(a, b)
        assert m.capacity == 5
        assert m.count() == 5
        assert m.channels["intensity"].shape == (5,)

    def test_extract_erase(self):
        """nanoPCL PointCloud::extract / erase (core/point_cloud.hpp)."""
        xyz = np.arange(15, dtype=np.float32).reshape(5, 3)
        cloud = pc.from_numpy(xyz, intensity=np.arange(5, dtype=np.float32))
        ex = pc.extract(cloud, [0, 3])
        assert ex.count() == ex.capacity == 2
        np.testing.assert_array_equal(np.asarray(ex.xyz), xyz[[0, 3]])
        np.testing.assert_array_equal(
            np.asarray(ex.channels["intensity"]), [0.0, 3.0]
        )
        er = pc.erase(cloud, [1, 2])
        assert er.count() == 3
        np.testing.assert_array_equal(np.asarray(er.xyz), xyz[[0, 3, 4]])
        # Masked-out points never survive extraction.
        crop = cloud.with_mask(cloud.mask & (jnp.arange(5) != 3))
        assert pc.extract(crop, [0, 3]).count() == 1


class TestTransform:
    def test_translation(self):
        cloud = pc.from_numpy(np.array([[1.0, 2.0, 3.0]]))
        T = tfm.make_transform(t=[1, -1, 0.5])
        out = tfm.transform_cloud(cloud, T)
        np.testing.assert_allclose(np.asarray(out.xyz[0]), [2, 1, 3.5])

    def test_rotation_yaw90(self):
        cloud = pc.from_numpy(np.array([[1.0, 0.0, 0.0]]))
        T = tfm.from_rpy(0, 0, np.pi / 2)
        out = tfm.transform_cloud(cloud, T)
        np.testing.assert_allclose(np.asarray(out.xyz[0]), [0, 1, 0], atol=1e-6)

    def test_inverse_roundtrip(self, rng):
        T = tfm.from_rpy(0.3, -0.2, 1.1, t=[1, 2, 3])
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        cloud = pc.from_numpy(pts)
        back = tfm.transform_cloud(
            tfm.transform_cloud(cloud, T), tfm.inverse(T)
        )
        np.testing.assert_allclose(np.asarray(back.xyz), pts, atol=1e-5)

    def test_normals_rotated_not_translated(self):
        cloud = pc.from_numpy(
            np.array([[0.0, 0.0, 0.0]]), normal=np.array([[1.0, 0.0, 0.0]])
        )
        T = tfm.from_rpy(0, 0, np.pi / 2, t=[5, 5, 5])
        out = tfm.transform_cloud(cloud, T)
        np.testing.assert_allclose(
            np.asarray(out.channels["normal"][0]), [0, 1, 0], atol=1e-6
        )

    def test_rotate_covariances(self):
        cov = jnp.broadcast_to(jnp.diag(jnp.array([1.0, 2.0, 3.0])), (1, 3, 3))
        T = tfm.from_rpy(0, 0, np.pi / 2)
        out = tfm.rotate_covariances(cov, T[:3, :3])
        np.testing.assert_allclose(
            np.asarray(out[0]), np.diag([2.0, 1.0, 3.0]), atol=1e-6
        )


class TestCrop:
    def test_crop_z_inside(self):
        cloud = cube_cloud()
        out = F.crop_z(cloud, 0.0, 1.0)
        kept = np.asarray(out.xyz)[np.asarray(out.mask)]
        assert np.all(kept[:, 2] >= 0.0)
        assert out.count() == 5 * 5 * 3  # z in {0, 0.5, 1}

    def test_crop_outside_mode(self):
        cloud = cube_cloud()
        inside = F.crop_z(cloud, 0.0, 1.0)
        outside = F.crop_z(cloud, 0.0, 1.0, F.FilterMode.OUTSIDE)
        assert inside.count() + outside.count() == cloud.count()

    def test_crop_range(self):
        cloud = pc.from_numpy(
            np.array([[0.1, 0, 0], [1.0, 0, 0], [5.0, 0, 0]])
        )
        out = F.crop_range(cloud, 0.5, 2.0)
        assert out.count() == 1

    def test_crop_box(self):
        cloud = cube_cloud()
        out = F.crop_box(cloud, [-0.5, -0.5, -0.5], [0.5, 0.5, 0.5])
        assert out.count() == 27

    def test_crop_angle_quadrant(self):
        cloud = pc.from_numpy(
            np.array([[1.0, 0.1, 0], [-1.0, 0.1, 0], [0.1, 1.0, 0]])
        )
        out = F.crop_angle(cloud, 0.0, np.pi / 2)
        kept = np.asarray(out.mask)
        assert kept[0] and kept[2] and not kept[1]


class TestVoxelGrid:
    def test_any_dedup(self):
        # Two points in the same voxel, one in a different voxel.
        cloud = pc.from_numpy(
            np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [1.5, 0, 0]])
        )
        out = F.voxel_grid(cloud, 1.0, F.VoxelMode.ANY)
        assert out.count() == 2
        # Deterministic: representative is the lowest original index.
        assert bool(out.mask[0]) and not bool(out.mask[1])

    def test_centroid(self):
        cloud = pc.from_numpy(
            np.array([[0.1, 0.1, 0.0], [0.3, 0.3, 0.0]], dtype=np.float32)
        )
        out = F.voxel_grid(cloud, 1.0, F.VoxelMode.CENTROID)
        kept = np.asarray(out.xyz)[np.asarray(out.mask)]
        np.testing.assert_allclose(kept[0], [0.2, 0.2, 0.0], atol=1e-6)

    def test_center(self):
        cloud = pc.from_numpy(np.array([[0.3, 0.4, 0.2]]))
        out = F.voxel_grid(cloud, 1.0, F.VoxelMode.CENTER)
        kept = np.asarray(out.xyz)[np.asarray(out.mask)]
        np.testing.assert_allclose(kept[0], [0.5, 0.5, 0.5])

    def test_nearest(self):
        cloud = pc.from_numpy(
            np.array([[0.1, 0.0, 0.0], [0.5, 0.0, 0.0], [0.9, 0.0, 0.0]])
        )
        out = F.voxel_grid(cloud, 1.0, F.VoxelMode.NEAREST)
        kept = np.asarray(out.xyz)[np.asarray(out.mask)]
        np.testing.assert_allclose(kept[0], [0.5, 0.0, 0.0])

    def test_negative_coords(self):
        cloud = pc.from_numpy(
            np.array([[-0.1, -0.1, -0.1], [-0.2, -0.2, -0.2], [0.1, 0.1, 0.1]])
        )
        out = F.voxel_grid(cloud, 1.0, F.VoxelMode.ANY)
        assert out.count() == 2

    def test_masked_points_ignored(self):
        cloud = pc.from_numpy(np.array([[0.1, 0, 0], [0.2, 0, 0]]))
        cloud = cloud.with_mask(jnp.array([False, True]))
        out = F.voxel_grid(cloud, 1.0, F.VoxelMode.ANY)
        assert not bool(out.mask[0]) and bool(out.mask[1])

    def test_unique_mask_helper(self):
        xyz = jnp.array([[0.1, 0, 0], [0.2, 0, 0], [3.0, 0, 0]])
        mask = jnp.ones(3, dtype=bool)
        out = F.voxel_unique_mask(xyz, mask, 1.0)
        assert int(out.sum()) == 2


class TestGridMaxZ:
    def test_keeps_highest(self):
        cloud = pc.from_numpy(
            np.array([[0.1, 0.1, 0.5], [0.2, 0.2, 2.0], [5.0, 5.0, 1.0]])
        )
        out = F.grid_max_z(cloud, 1.0)
        kept = np.asarray(out.xyz)[np.asarray(out.mask)]
        assert kept.shape[0] == 2
        assert 2.0 in kept[:, 2]
        assert 0.5 not in kept[:, 2]


class TestDeskew:
    def test_endpoint_poses(self):
        xyz = np.zeros((2, 3), dtype=np.float32)
        cloud = pc.from_numpy(
            xyz, time=np.array([0.0, 1.0], dtype=np.float32)
        )
        T0 = tfm.make_transform(t=[0, 0, 0])
        T1 = tfm.make_transform(t=[1, 0, 0])
        out = F.deskew(cloud, T0, T1, 0.0, 1.0)
        # Output is in the END-of-scan frame (reference T_rel = T_end^-1
        # T(t)): the t=0 point compensates by the full relative motion,
        # the t=1 point is already in the end frame.
        np.testing.assert_allclose(
            np.asarray(out.xyz[0]), [-1, 0, 0], atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(out.xyz[1]), [0, 0, 0], atol=1e-6)

    def test_midpoint_rotation(self):
        cloud = pc.from_numpy(
            np.array([[1.0, 0.0, 0.0]]), time=np.array([0.5], np.float32)
        )
        T0 = tfm.make_transform()
        T1 = tfm.from_rpy(0, 0, np.pi / 2)
        out = F.deskew(cloud, T0, T1, 0.0, 1.0)
        # T_end^-1 T(0.5) = Rz(-pi/4) applied to (1, 0, 0).
        ang = np.arctan2(float(out.xyz[0, 1]), float(out.xyz[0, 0]))
        np.testing.assert_allclose(ang, -np.pi / 4, atol=1e-5)


class TestDeskewVariants:
    def test_channel_auto_range(self):
        xyz = np.zeros((3, 3), dtype=np.float32)
        cloud = pc.from_numpy(
            xyz, time=np.array([10.0, 10.5, 11.0], dtype=np.float32)
        )
        T0 = tfm.make_transform(t=[0, 0, 0])
        T1 = tfm.make_transform(t=[2, 0, 0])
        out = F.deskew(cloud, T0, T1)  # auto t0/t1 from channel
        np.testing.assert_allclose(
            np.asarray(out.xyz)[:, 0], [-2, -1, 0], atol=1e-5
        )

    def test_index_strategy(self):
        xyz = np.zeros((5, 3), dtype=np.float32)
        cloud = pc.from_numpy(xyz)
        T0 = tfm.make_transform(t=[0, 0, 0])
        T1 = tfm.make_transform(t=[4, 0, 0])
        out = F.deskew(cloud, T0, T1, strategy="index")
        np.testing.assert_allclose(
            np.asarray(out.xyz)[:, 0], [-4, -3, -2, -1, 0], atol=1e-5
        )

    def test_lookup_matches_linear(self):
        rngl = np.random.default_rng(3)
        xyz = rngl.normal(size=(50, 3)).astype(np.float32)
        times = np.linspace(5.0, 6.0, 50).astype(np.float32)
        cloud = pc.from_numpy(xyz, time=times)
        T0 = np.asarray(tfm.make_transform(t=[0, 0, 0]))
        T1 = np.asarray(tfm.make_transform(t=[1, 2, 0]))

        def lookup(t):
            a = (t - 5.0) / 1.0
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = (1 - a) * T0[:3, 3] + a * T1[:3, 3]
            return T

        out_lin = F.deskew(cloud, jnp.asarray(T0), jnp.asarray(T1))
        out_lut = F.deskew_lookup(cloud, lookup, num_waypoints=8)
        np.testing.assert_allclose(
            np.asarray(out_lut.xyz), np.asarray(out_lin.xyz), atol=1e-5
        )


class TestDepthImage:
    def test_backprojection(self):
        from fastdem_tpu.cloud.depth import depth_to_cloud

        depth = np.full((4, 6), 2.0, dtype=np.float32)
        cloud = depth_to_cloud(depth, fx=100, fy=100, cx=3.0, cy=2.0)
        assert cloud.count() == 24
        xyz = np.asarray(cloud.xyz).reshape(4, 6, 3)
        # Principal-point pixel projects to (0, 0, depth).
        np.testing.assert_allclose(xyz[2, 3], [0, 0, 2.0], atol=1e-6)
        # One pixel right of center: x = (u - cx)/fx * d = 0.02.
        np.testing.assert_allclose(xyz[2, 4], [0.02, 0, 2.0], atol=1e-6)

    def test_invalid_depths_masked(self):
        from fastdem_tpu.cloud.depth import depth_to_cloud

        depth = np.array([[1.0, 0.0], [np.nan, 5.0]], dtype=np.float32)
        cloud = depth_to_cloud(depth, 50, 50, 1, 1, max_depth=3.0)
        assert cloud.count() == 1

    def test_uint16_scale_and_rgb(self):
        from fastdem_tpu.cloud.depth import depth_to_cloud

        depth = np.full((2, 2), 1500, dtype=np.uint16)  # 1.5 m in mm
        rgb = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
        cloud = depth_to_cloud(depth, 50, 50, 1, 1, rgb=rgb, depth_scale=1e-3)
        z = np.asarray(cloud.xyz)[:, 2]
        np.testing.assert_allclose(z, 1.5, atol=1e-6)
        assert cloud.channels["color"].shape == (4, 3)

    def test_full_rgbd_pipeline(self):
        """Depth image -> cloud -> RGB-D noise model -> map."""
        import fastdem_tpu as fd
        from fastdem_tpu.cloud.depth import camera_to_base_transform, depth_to_cloud
        from fastdem_tpu.config.config import SensorType

        rngl = np.random.default_rng(0)
        depth = (1.5 + 0.05 * rngl.normal(size=(60, 80))).astype(np.float32)
        cloud = depth_to_cloud(depth, fx=60, fy=60, cx=40, cy=30)
        geom = fd.GridGeometry.from_length(8.0, 8.0, 0.1)
        cfg = fd.Config()
        cfg.sensor_model.type = SensorType.RGBD
        m = fd.FastDEM(geom, cfg)
        # Camera looking down from 2 m.
        T_bs = camera_to_base_transform(roll=np.pi, yaw=0, t=[0, 0, 2.0])
        ok = m.integrate(cloud, T_bs, np.eye(4, dtype=np.float32))
        assert ok
        elev = np.asarray(m.state.layers["elevation"])
        finite = np.isfinite(elev)
        assert finite.sum() > 50
        # Ground plane at z = 2.0 - 1.5 = 0.5.
        np.testing.assert_allclose(
            np.nanmedian(elev[finite]), 0.5, atol=0.1
        )


def test_deskew_lookup_rotates_normals():
    """deskew_lookup must rotate the normal channel with the per-point
    relative motion like deskew does (regression: normals were left in
    their capture orientations)."""
    import numpy as np

    from fastdem_tpu.cloud import transform as tfm
    from fastdem_tpu.cloud.filters import deskew, deskew_lookup
    from fastdem_tpu.cloud.pointcloud import from_numpy

    n = 64
    rng = np.random.default_rng(0)
    xyz = rng.normal(0, 2, (n, 3)).astype(np.float32)
    t = np.linspace(0.0, 0.1, n).astype(np.float32)
    nrm = rng.normal(0, 1, (n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    cloud = from_numpy(xyz, time=t, normal=nrm)

    # Linear trajectory: a constant-rate rotation about z + translation.
    def pose(tt):
        a = 0.5 * (tt / 0.1)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
             [0, 0, 1]], np.float32,
        )
        T[0, 3] = tt * 3.0
        return T

    out_ref = deskew(cloud, jnp.asarray(pose(0.0)), jnp.asarray(pose(0.1)))
    out = deskew_lookup(cloud, pose, num_waypoints=32)
    np.testing.assert_allclose(
        np.asarray(out.channels["normal"]),
        np.asarray(out_ref.channels["normal"]),
        atol=2e-3,
    )
    # Unit length preserved (pure rotation).
    ln = np.linalg.norm(np.asarray(out.channels["normal"]), axis=1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-3)


def test_ladder_capacity():
    from fastdem_tpu.cloud.pointcloud import ladder_capacity

    assert ladder_capacity(0) == 4096
    assert ladder_capacity(1) == 4096
    assert ladder_capacity(4096) == 4096
    assert ladder_capacity(4097) == 8192
    assert ladder_capacity(120000) == 131072
    assert ladder_capacity(300000) == 524288
    assert ladder_capacity(100, base=64) == 128


def test_stage_carries_valid_count():
    """stage() must propagate valid_count: dropping it silently disables
    FastDEM.integrate's auto-bucketing in the documented from_numpy ->
    stage streaming flow (r4 review fix)."""
    from fastdem_tpu.cloud.pointcloud import from_numpy, stage

    xyz = np.zeros((10, 3), dtype=np.float32)
    xyz[7:] = np.nan  # 3 invalid points
    c = from_numpy(xyz, capacity=16)
    assert c.valid_count == 7
    staged = stage(c)
    assert staged.valid_count == 7
    assert staged.nominal_count == c.nominal_count


def test_depth_to_cloud_valid_count():
    """depth_to_cloud populates valid_count (the auto-bucketing trigger for
    the canonical RGB-D ingestion path), skips it under jit tracing, and
    honors count_valid=False."""
    import jax

    from fastdem_tpu.cloud.depth import depth_to_cloud

    depth = np.array([[1.0, 0.0], [np.nan, 5.0]], dtype=np.float32)
    cloud = depth_to_cloud(depth, 50, 50, 1, 1, max_depth=3.0)
    assert cloud.valid_count == 1

    cloud_off = depth_to_cloud(
        depth, 50, 50, 1, 1, max_depth=3.0, count_valid=False
    )
    assert cloud_off.valid_count == -1

    @jax.jit
    def build(d):
        c = depth_to_cloud(d, 50, 50, 1, 1, max_depth=3.0)
        return c.xyz, c.mask

    xyz, mask = build(depth)  # must not raise TracerError
    assert int(np.count_nonzero(np.asarray(mask))) == 1


def test_two_length_diff_estimator():
    """benchtime.two_length_diff_ms cancels a constant per-call dispatch
    offset exactly and clamps non-positive differences."""
    from fastdem_tpu.utils.benchtime import median, two_length_diff_ms

    K = 8
    # Simulated clock: each call sleeps dispatch + K*s (s = 1 ms).
    import time as _t

    def fake(n_iters):
        def run():
            _t.sleep(0.020 + n_iters * 0.001)

        return run

    ms, per_pair, med_k = two_length_diff_ms(
        fake(K), fake(2 * K), K, pairs=3
    )
    assert 0.8 < ms < 1.6  # true s = 1 ms; dispatch (20 ms) cancelled
    assert len(per_pair) == 3
    assert med_k > 0.020
    # Raw quotient would have been wildly dispatch-inflated:
    assert med_k / K * 1e3 > 3.0
    # Degenerate: identical legs clamp to the floor, never negative.
    ms0, _, _ = two_length_diff_ms(fake(K), fake(K), K, pairs=2)
    assert ms0 >= 1e-4
    assert median([1.0, 2.0, 3.0, 4.0]) == 2.5


def test_benchtime_summarize():
    """IQR-outlier-removed stats in the reference harness's shape
    (nanoPCL benchmark_common.hpp Stats: mean/stddev/median/CI95)."""
    from fastdem_tpu.utils.benchtime import summarize

    st = summarize([10.0, 10.2, 9.8, 10.1, 9.9, 100.0])  # one stall outlier
    assert st["outliers_removed"] == 1
    assert st["n"] == 5
    assert 9.9 < st["mean"] < 10.1
    assert 9.9 <= st["median"] <= 10.1
    assert st["max"] <= 10.2
    assert st["ci95"] > 0
    st1 = summarize([5.0])
    assert st1["n"] == 1 and st1["stddev"] == 0.0 and st1["ci95"] == 0.0
    import pytest

    with pytest.raises(ValueError):
        summarize([])
