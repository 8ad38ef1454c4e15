"""ROS wire codec tests: PointCloud2 / GridMap message structures
(runtime/wire.py). Byte-level goldens vs the compiled reference live in
tests/test_reference_goldens.py (pc2 / pc2cloud modes)."""

import jax.numpy as jnp
import numpy as np

from fastdem_tpu import Config, GridGeometry
from fastdem_tpu.cloud.pointcloud import from_numpy
from fastdem_tpu.grid.gridmap import layers
from fastdem_tpu.mapping.pipeline import build_integrate, create_map_state
from fastdem_tpu.runtime import wire


def small_map():
    geom = GridGeometry.from_length(4.0, 4.0, 0.5)  # 8x8
    cfg = Config()
    step = build_integrate(geom, cfg, donate=False, has_color=True)
    state = create_map_state(geom, cfg, has_color=True)
    rng = np.random.default_rng(0)
    n = 500
    xyz = np.column_stack(
        [rng.uniform(-1.8, 1.8, (n, 2)), rng.normal(-0.5, 0.1, (n, 1))]
    ).astype(np.float32)
    from fastdem_tpu.utils.colors import pack_rgb

    color = pack_rgb(
        jnp.asarray(rng.integers(0, 256, (n, 3)).astype(np.uint8))
    )
    state, _ = step(
        state, jnp.asarray(xyz), jnp.ones(n, bool), jnp.eye(4), jnp.eye(4),
        None, color,
    )
    return geom, state


class TestMapToPointCloud2:
    def test_field_table_layout(self):
        geom, state = small_map()
        msg = wire.map_to_pointcloud2(geom, state, frame_id="map")
        names = [f.name for f in msg.fields]
        assert names[:3] == ["x", "y", "z"]
        assert names[-1] == "rgb"
        assert "elevation" not in names  # it IS z
        assert all(not n.startswith("_") for n in names)
        offs = [f.offset for f in msg.fields]
        assert offs == list(range(0, 4 * len(names), 4))
        assert msg.point_step == 4 * len(names)
        assert msg.row_step == msg.width * msg.point_step
        assert len(msg.data) == msg.row_step

    def test_points_match_map_cells(self):
        geom, state = small_map()
        msg = wire.map_to_pointcloud2(geom, state)
        rec = np.frombuffer(
            msg.data, dtype=wire._np_fields(msg.fields, msg.point_step)
        )
        elev = np.asarray(state.layers[layers.elevation])
        assert msg.width == int(np.isfinite(elev).sum())
        # Every emitted z is a finite elevation value; x/y are cell centers.
        assert np.isfinite(rec["z"]).all()
        assert set(np.round(rec["z"], 5)) <= set(
            np.round(elev[np.isfinite(elev)], 5)
        )

    def test_submap(self):
        geom, state = small_map()
        full = wire.map_to_pointcloud2(geom, state)
        sub = wire.map_to_pointcloud2(
            geom, state, submap=(slice(2, 6), slice(2, 6))
        )
        assert sub.width <= full.width
        assert sub.point_step == full.point_step


class TestCloudCodec:
    def test_roundtrip_all_channels(self):
        rng = np.random.default_rng(1)
        n = 300
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        cloud = from_numpy(
            xyz,
            frame_id="lidar",
            timestamp_ns=123456789,
            intensity=rng.uniform(0, 100, n).astype(np.float32),
            ring=rng.integers(0, 16, n).astype(np.int32),
            time=rng.uniform(0, 0.1, n).astype(np.float32),
            color=rng.integers(0, 256, (n, 3)).astype(np.uint8),
            label=rng.integers(0, 5, n).astype(np.int32),
            normal=rng.normal(size=(n, 4)).astype(np.float32),
        )
        msg = wire.cloud_to_pointcloud2(cloud)
        names = [f.name for f in msg.fields]
        assert names == [
            "x", "y", "z", "intensity", "ring", "time", "rgb", "label",
            "normal_x", "normal_y", "normal_z",
        ]
        # ring is u16 at a 2-byte slot, like nanoPCL's writer.
        ring_f = next(f for f in msg.fields if f.name == "ring")
        assert ring_f.datatype == wire.UINT16
        assert msg.point_step == 4 * 9 + 2 + 4  # 9 f32 + u16 + u32

        back = wire.pointcloud2_to_cloud(msg)
        assert back.frame_id == "lidar"
        np.testing.assert_allclose(
            np.asarray(back.xyz)[np.asarray(back.mask)], xyz, atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(back.channels["ring"]),
            np.asarray(cloud.channels["ring"]),
        )
        np.testing.assert_array_equal(
            np.asarray(back.channels["color"]),
            np.asarray(cloud.channels["color"]),
        )
        np.testing.assert_allclose(
            np.asarray(back.channels["normal"])[:, :3],
            np.asarray(cloud.channels["normal"])[:, :3],
        )

    def test_masked_points_compact_out(self):
        xyz = np.zeros((4, 3), np.float32)
        cloud = from_numpy(xyz)
        cloud = cloud.with_mask(jnp.asarray([True, False, True, False]))
        msg = wire.cloud_to_pointcloud2(cloud)
        assert msg.width == 2

    def test_decoder_handles_foreign_layout(self):
        # A VLP-16-style message with padding and non-f32 intensity.
        n = 5
        dt = np.dtype(
            {
                "names": ["x", "y", "z", "intensity", "ring"],
                "formats": [
                    np.float32, np.float32, np.float32, np.uint8, np.uint16
                ],
                "offsets": [0, 4, 8, 16, 18],
                "itemsize": 32,
            }
        )
        rec = np.zeros(n, dt)
        rec["x"] = np.arange(n)
        rec["z"] = 1.0
        rec["intensity"] = 7
        rec["ring"] = 3
        msg = wire.PointCloud2(
            frame_id="velodyne",
            stamp_ns=0,
            height=1,
            width=n,
            fields=[
                wire.PointField("x", 0, wire.FLOAT32),
                wire.PointField("y", 4, wire.FLOAT32),
                wire.PointField("z", 8, wire.FLOAT32),
                wire.PointField("intensity", 16, wire.UINT8),
                wire.PointField("ring", 18, wire.UINT16),
            ],
            is_bigendian=False,
            point_step=32,
            row_step=32 * n,
            data=rec.tobytes(),
            is_dense=True,
        )
        cloud = wire.pointcloud2_to_cloud(msg)
        assert float(np.asarray(cloud.channels["intensity"])[0]) == 7.0
        assert int(np.asarray(cloud.channels["ring"])[0]) == 3


class TestGridMapMsg:
    def test_structure(self):
        geom, state = small_map()
        msg = wire.map_to_gridmap_msg(geom, state, frame_id="map")
        assert msg["info"]["resolution"] == geom.resolution
        assert set(msg["layers"]) == {
            k for k in state.layers if not k.startswith("_")
        }
        assert msg["basic_layers"] == ["elevation"]
        i = msg["layers"].index("elevation")
        arr = msg["data"][i]
        dims = arr["layout"]["dim"]
        assert dims[0]["label"] == "column_index"
        assert dims[0]["size"] == geom.cols
        assert dims[1]["size"] == geom.rows
        # Column-major data: reshaping (cols, rows) then transposing
        # recovers the layer.
        back = arr["data"].reshape(geom.cols, geom.rows).T
        np.testing.assert_array_equal(
            back, np.asarray(state.layers["elevation"]),
        )


class TestPclBridge:
    def test_pointxyzi_layout(self):
        rng = np.random.default_rng(2)
        n = 50
        cloud = from_numpy(
            rng.normal(size=(n, 3)).astype(np.float32),
            intensity=rng.uniform(0, 10, n).astype(np.float32),
        )
        rec = wire.cloud_to_pcl(cloud, "PointXYZI")
        # pcl::PointXYZI: 32-byte record, intensity at offset 16.
        assert rec.dtype.itemsize == 32
        assert rec.dtype.fields["intensity"][1] == 16
        back = wire.pcl_to_cloud(rec)
        np.testing.assert_allclose(
            np.asarray(back.xyz)[np.asarray(back.mask)],
            np.asarray(cloud.xyz),
        )
        np.testing.assert_allclose(
            np.asarray(back.channels["intensity"]),
            np.asarray(cloud.channels["intensity"]),
        )

    def test_rgb_normal_roundtrip(self):
        rng = np.random.default_rng(3)
        n = 40
        cloud = from_numpy(
            rng.normal(size=(n, 3)).astype(np.float32),
            color=rng.integers(0, 256, (n, 3)).astype(np.uint8),
            normal=rng.normal(size=(n, 4)).astype(np.float32),
        )
        rec = wire.cloud_to_pcl(cloud, "PointXYZRGBNormal")
        assert rec.dtype.itemsize == 48
        back = wire.pcl_to_cloud(rec)
        np.testing.assert_array_equal(
            np.asarray(back.channels["color"]),
            np.asarray(cloud.channels["color"]),
        )
        np.testing.assert_allclose(
            np.asarray(back.channels["normal"])[:, :3],
            np.asarray(cloud.channels["normal"])[:, :3],
        )

    def test_unknown_type_raises(self):
        cloud = from_numpy(np.zeros((1, 3), np.float32))
        import pytest as _pytest

        with _pytest.raises(ValueError):
            wire.cloud_to_pcl(cloud, "PointBogus")


class TestOrganizedClouds:
    def test_row_step_padding(self):
        """Organized clouds (height > 1) with padded rows must parse at
        row_step strides — regression: frombuffer read the padding as
        point records and shifted every later row."""
        import numpy as np

        from fastdem_tpu.runtime.wire import (
            FLOAT32,
            PointCloud2,
            PointField,
            pointcloud2_to_cloud,
        )

        h, w = 3, 4
        point_step = 12
        pad = 8  # bytes of per-row padding
        row_step = w * point_step + pad
        pts = np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3)
        data = b""
        for r in range(h):
            data += pts[r].tobytes() + b"\x00" * pad
        msg = PointCloud2(
            frame_id="cam", stamp_ns=0, height=h, width=w,
            fields=[
                PointField("x", 0, FLOAT32), PointField("y", 4, FLOAT32),
                PointField("z", 8, FLOAT32),
            ],
            is_bigendian=False, point_step=point_step, row_step=row_step,
            data=data, is_dense=True,
        )
        cloud = pointcloud2_to_cloud(msg)
        np.testing.assert_array_equal(
            np.asarray(cloud.xyz), pts.reshape(-1, 3)
        )

    def test_multi_count_field(self):
        """PointField.count > 1 parses as a subarray; scalar consumers
        take element 0 instead of misreading neighboring bytes."""
        import numpy as np

        from fastdem_tpu.runtime.wire import (
            FLOAT32,
            PointCloud2,
            PointField,
            pointcloud2_to_cloud,
        )

        n = 5
        rec = np.zeros(
            n,
            dtype=np.dtype(
                {
                    "names": ["x", "y", "z", "intensity"],
                    "formats": ["<f4", "<f4", "<f4", ("<f4", (2,))],
                    "offsets": [0, 4, 8, 12],
                    "itemsize": 20,
                }
            ),
        )
        rec["x"] = np.arange(n)
        rec["y"] = 1.0
        rec["z"] = 2.0
        rec["intensity"][:, 0] = 7.0
        rec["intensity"][:, 1] = -1.0  # must be ignored
        msg = PointCloud2(
            frame_id="s", stamp_ns=0, height=1, width=n,
            fields=[
                PointField("x", 0, FLOAT32), PointField("y", 4, FLOAT32),
                PointField("z", 8, FLOAT32),
                PointField("intensity", 12, FLOAT32, count=2),
            ],
            is_bigendian=False, point_step=20, row_step=n * 20,
            data=rec.tobytes(), is_dense=True,
        )
        cloud = pointcloud2_to_cloud(msg)
        np.testing.assert_array_equal(
            np.asarray(cloud.channels["intensity"]), np.full(n, 7.0)
        )
