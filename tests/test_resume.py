"""Checkpoint/resume and concurrency tests (SURVEY.md sec. 5.2/5.4).

The npz checkpoint carries every internal estimator layer, so an
interrupted mapping session resumed from disk must match an uninterrupted
one bit-for-bit; the driver must stay consistent under concurrent scan
intake and postprocess/viz timers.
"""

import threading
import time

import numpy as np
import pytest

import fastdem_tpu as fd
from fastdem_tpu.cloud import pointcloud as pc
from fastdem_tpu.grid.gridmap import layers
from fastdem_tpu.io.npz import load_npz, save_npz


def scan(seed, n=4000):
    rng = np.random.default_rng(seed)
    pts = np.column_stack(
        [
            rng.uniform(-4, 4, n),
            rng.uniform(-4, 4, n),
            0.2 * np.sin(rng.uniform(-4, 4, n)) + rng.normal(0, 0.02, n),
        ]
    ).astype(np.float32)
    return pc.from_numpy(pts, frame_id="lidar")


I4 = np.eye(4, dtype=np.float32)


class TestCheckpointResume:
    @pytest.mark.parametrize(
        "est", [fd.EstimationType.KALMAN, fd.EstimationType.P2_QUANTILE]
    )
    def test_resume_matches_uninterrupted(self, tmp_path, est):
        geom = fd.GridGeometry.from_length(10.0, 10.0, 0.2)
        cfg = fd.Config()
        cfg.mapping.estimation_type = est
        cfg.raycasting.enabled = True

        # Uninterrupted session: 6 scans.
        m1 = fd.FastDEM(geom, cfg)
        for i in range(6):
            assert m1.integrate(scan(i), I4, I4)

        # Interrupted session: 3 scans -> checkpoint -> reload -> 3 more.
        m2 = fd.FastDEM(geom, cfg)
        for i in range(3):
            m2.integrate(scan(i), I4, I4)
        path = str(tmp_path / "ckpt.npz")
        assert save_npz(path, geom, m2.state)

        m3 = fd.FastDEM(geom, cfg)
        geom_l, state_l, meta = load_npz(path)
        assert geom_l == geom
        # The checkpoint carries the full layer set incl. internals.
        assert set(state_l.layers) == set(m3.state.layers)
        m3.state = state_l
        for i in range(3, 6):
            assert m3.integrate(scan(i), I4, I4)

        for name in m1.state.layers:
            np.testing.assert_array_equal(
                np.asarray(m1.state.layers[name]),
                np.asarray(m3.state.layers[name]),
                err_msg=f"layer {name} diverged after resume",
            )


class TestDriverConcurrency:
    def test_concurrent_scans_and_services(self):
        """Hammer the driver from a scan thread while timers run; no
        exceptions, consistent final state (the reference's shared_mutex
        contract, fastdem.hpp:49-53)."""
        from fastdem_tpu.config.config import PostProcessConfig
        from fastdem_tpu.runtime.driver import MappingDriver
        from fastdem_tpu.runtime.providers import StaticCalibration, StaticOdometry

        geom = fd.GridGeometry.from_length(6.0, 6.0, 0.1)
        calib = StaticCalibration()
        calib.set_extrinsic("lidar", I4)
        pp = PostProcessConfig()
        pp.inpainting.enabled = True
        errors = []
        published = []

        with MappingDriver(
            geom,
            fd.Config(),
            postprocess_cfg=pp,
            calibration=calib,
            odometry=StaticOdometry(),
            postprocess_rate=15.0,
            viz_rate=15.0,
        ) as d:
            d.sinks["map"] = lambda p: published.append(p["scan_count"])

            def feeder():
                try:
                    for i in range(12):
                        assert d.on_scan(scan(i, n=1500))
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

            t = threading.Thread(target=feeder)
            t.start()
            # Interleave service calls from the main thread.
            for _ in range(4):
                d.run_postprocess()
                time.sleep(0.05)
            t.join(timeout=60)
            assert not t.is_alive()
            final = np.asarray(d.mapper.state.layers[layers.elevation])

        assert not errors, errors
        assert np.isfinite(final).sum() > 100
        assert d._scan_count == 12
