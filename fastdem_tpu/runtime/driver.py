"""Streaming mapping driver: the ROS-node equivalent without ROS.

Re-expresses the behavioral surface of the reference node
(/root/reference/ros2/src/fastdem_ros_node.cpp):
  * scan intake -> integrate under a writer lock (:178-198)
  * periodic local-view / global-submap publishing via pluggable sinks
    (:247-296; topics become callbacks / npz / png artifacts)
  * periodic post-processing on a SNAPSHOT of {elevation, upper, lower}
    (:202-245) — under JAX, arrays are immutable so the snapshot is a free
    dict subset rather than a copy; the postprocess chain runs as one jitted
    function and can overlap with mapping on-device
  * trigger services -> methods: reset / run_postprocess / run_inpainting /
    run_uncertainty_fusion / run_feature_extraction (:131-135)
  * startup summary banner (:298-356)

Threading mirrors the reference's 3-lane executor: the caller's scan thread,
a viz timer, and a postprocess timer, serialized around the FastDEM facade
with an RLock (the facade itself is not thread-safe, fastdem.hpp:49-53).
"""

from __future__ import annotations

import logging
import threading
from typing import Callable, Dict, Optional

import numpy as np

from fastdem_tpu.config.config import Config, PostProcessConfig
from fastdem_tpu.grid import gridmap as gm
from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.grid.gridmap import layers
from fastdem_tpu.mapping.pipeline import FastDEM
from fastdem_tpu.postprocess import apply_postprocess_fn

log = logging.getLogger("fastdem_tpu.runtime")


class MappingDriver:
    """Online mapping session driver."""

    def __init__(
        self,
        geom: GridGeometry,
        cfg: Optional[Config] = None,
        postprocess_cfg: Optional[PostProcessConfig] = None,
        calibration=None,
        odometry=None,
        postprocess_rate: float = 1.0,
        viz_rate: float = 2.0,
        global_rate: float = 0.0,
        global_window: tuple = (15.0, 15.0),
        artifact_dir: Optional[str] = None,
        async_intake: bool = False,
        burst_batch: int = 8,
        max_queue: int = 64,
        stage_ahead: bool = True,
        **mapper_kwargs,
    ):
        import jax

        self.geom = geom
        self.mapper = FastDEM(geom, cfg, **mapper_kwargs)
        if calibration is not None:
            self.mapper.set_calibration_provider(calibration)
        if odometry is not None:
            self.mapper.set_odometry_provider(odometry)
        self.pp_cfg = postprocess_cfg or PostProcessConfig()
        self._pp_fn = jax.jit(apply_postprocess_fn(geom, self.pp_cfg))
        self.postprocess_rate = postprocess_rate
        self.viz_rate = viz_rate
        self.global_rate = global_rate
        self.global_window = global_window
        self.artifact_dir = artifact_dir

        self._lock = threading.RLock()
        self._timers: list[threading.Thread] = []
        self._stop = threading.Event()
        self._scan_count = 0
        self._started = False

        # Pluggable sinks (the 'topics'): name -> callback(payload dict).
        self.sinks: Dict[str, Callable[[dict], None]] = {}
        self.postprocess_result: Optional[Dict[str, np.ndarray]] = None
        # Jitted postprocess variants cached per (uf, inpaint, features) —
        # re-jitting per service call would recompile every time.
        self._pp_cache: Dict[tuple, Callable] = {}

        # Async intake: scans enqueue and a worker drains them, integrating
        # backlogs as one batched device program (integrate_sequence). Under
        # overload the OLDEST scans drop, like the reference node's
        # SensorDataQoS keep-last subscription (fastdem_ros_node.cpp:100).
        self.async_intake = async_intake
        self.burst_batch = max(1, burst_batch)
        self.max_queue = max(1, max_queue)
        # Double buffering: while a burst integrates, the next queued
        # scans' H2D transfers are started (pointcloud.stage), so the
        # copy rides under device compute instead of serializing with it.
        self.stage_ahead = stage_ahead
        self.dropped_scans = 0
        self._queue: list = []
        self._inflight = 0
        self._qcond = threading.Condition()
        self._intake_thread: Optional[threading.Thread] = None
        if async_intake:
            self._intake_thread = threading.Thread(
                target=self._intake_loop, daemon=True
            )
            self._intake_thread.start()

        self._banner()

    # -- intake ------------------------------------------------------------
    def on_scan(self, cloud, T_base_sensor=None, T_world_base=None) -> bool:
        """Scan callback.

        Synchronous mode (default): integrate inline and report the result,
        like the reference's scanCallback. With ``async_intake`` the scan is
        enqueued (True = accepted) and a worker integrates it — backlogs
        collapse into batched device programs; the oldest queued scans drop
        under overload (``dropped_scans`` counts them).
        """
        if self.async_intake:
            with self._qcond:
                if self._stop.is_set():
                    return False
                self._queue.append((cloud, T_base_sensor, T_world_base))
                while len(self._queue) > self.max_queue:
                    self._queue.pop(0)
                    self.dropped_scans += 1
                self._qcond.notify()
            return True
        return self._integrate_one(cloud, T_base_sensor, T_world_base)

    def _integrate_one(self, cloud, T_bs, T_wb) -> bool:
        with self._lock:
            ok = self.mapper.integrate(cloud, T_bs, T_wb)
            if ok:
                self._scan_count += 1
                if not self._started:
                    self._started = True
                    self._start_timers()
        return ok

    def _intake_loop(self):
        while True:
            with self._qcond:
                while not self._queue and not self._stop.is_set():
                    self._qcond.wait(0.1)
                if self._stop.is_set() and not self._queue:
                    return
                items = self._queue[: self.burst_batch]
                del self._queue[: len(items)]
                self._inflight = len(items)
                # Snapshot the next burst for stage-ahead OUTSIDE the
                # lock: device_put dispatches can take tens of ms each on
                # a remote backend, and holding _qcond that long would
                # stall on_scan producers exactly when backlogged.
                to_stage = (
                    list(self._queue[: self.burst_batch])
                    if self.stage_ahead
                    else []
                )
            if to_stage:
                # Kick off H2D for the NEXT burst while this one computes
                # (transfers are async). Entries are re-matched by
                # identity under a short re-acquire so drop-oldest
                # eviction that happened meanwhile stays intact.
                from fastdem_tpu.cloud.pointcloud import stage

                staged = []
                for c, tbs, twb in to_stage:
                    try:
                        staged.append(((c, tbs, twb), (stage(c), tbs, twb)))
                    except Exception:  # noqa: BLE001
                        break
                if staged:
                    with self._qcond:
                        for orig, new in staged:
                            for i, cur in enumerate(self._queue):
                                if cur is orig or cur[0] is orig[0]:
                                    self._queue[i] = new
                                    break
            try:
                if len(items) == 1:
                    self._integrate_one(*items[0])
                else:
                    self._integrate_burst(items)
            except Exception:  # noqa: BLE001 - intake must not die
                log.exception("driver intake error")
            finally:
                with self._qcond:
                    self._inflight = 0
                    self._qcond.notify_all()

    def _integrate_burst(self, items):
        """Integrate a backlog as batched device programs: runs of scans
        with the same transform mode (explicit vs provider) go through
        integrate_sequence; mode switches split the run.

        Observation callbacks force the per-scan path: integrate_sequence
        does not materialize per-frame aux, so batching would silently
        skip on_preprocessed/on_rasterized."""
        if (
            self.mapper.on_preprocessed is not None
            or self.mapper.on_rasterized is not None
        ):
            for cloud, tbs, twb in items:
                self._integrate_one(cloud, tbs, twb)
            return
        runs = []
        for cloud, tbs, twb in items:
            # Same rule as FastDEM.integrate: explicit mode needs BOTH
            # transforms, otherwise the providers are queried.
            explicit = tbs is not None and twb is not None
            if not runs or runs[-1][0] != explicit:
                runs.append((explicit, []))
            runs[-1][1].append((cloud, tbs, twb))
        for explicit, run in runs:
            with self._lock:
                if len(run) == 1:
                    c, tbs, twb = run[0]
                    ok = self.mapper.integrate(c, tbs, twb)
                    n = int(ok)
                elif explicit:
                    clouds = [c for c, _, _ in run]
                    tbs0 = run[0][1]
                    same_tbs = all(
                        t is tbs0
                        or np.array_equal(np.asarray(t), np.asarray(tbs0))
                        for _, t, _ in run
                    )
                    tbs = (
                        tbs0
                        if same_tbs
                        else np.stack(
                            [np.asarray(t, np.float32) for _, t, _ in run]
                        )
                    )
                    twb = np.stack(
                        [np.asarray(t, np.float32) for _, _, t in run]
                    )
                    n = self.mapper.integrate_sequence(
                        clouds, tbs, twb, batch=self.burst_batch
                    )
                else:
                    n = self.mapper.integrate_sequence(
                        [c for c, _, _ in run], batch=self.burst_batch
                    )
                if n:
                    self._scan_count += n
                    if not self._started:
                        self._started = True
                        self._start_timers()

    def drain(self, timeout: float = 30.0) -> bool:
        """Block until the async intake queue is empty and no burst is in
        flight (tests/shutdown)."""
        import time as _time

        deadline = _time.time() + timeout
        with self._qcond:
            while self._queue or self._inflight:
                remaining = deadline - _time.time()
                if remaining <= 0:
                    return False
                self._qcond.wait(min(remaining, 0.1))
        return True

    # -- timers ------------------------------------------------------------
    def _start_timers(self):
        """Timers start on the first scan (fastdem_ros_node.cpp:185-191)."""
        if self.postprocess_rate > 0:
            self._spawn(self._pp_loop, 1.0 / self.postprocess_rate)
        if self.viz_rate > 0:
            self._spawn(self._viz_loop, 1.0 / self.viz_rate)
        if self.global_rate > 0:
            self._spawn(self._global_loop, 1.0 / self.global_rate)

    def _spawn(self, fn, period):
        t = threading.Thread(target=self._loop, args=(fn, period), daemon=True)
        t.start()
        self._timers.append(t)

    def _loop(self, fn, period):
        while not self._stop.wait(period):
            try:
                fn()
            except Exception:  # noqa: BLE001 - timers must not die
                log.exception("driver timer error")

    def close(self):
        if self.async_intake and not self.drain(timeout=120.0):
            log.warning(
                "intake queue did not drain before close; %d scans dropped",
                len(self._queue),
            )
        self._stop.set()
        with self._qcond:
            self._qcond.notify_all()
        if self._intake_thread is not None:
            self._intake_thread.join(timeout=5.0)
        for t in self._timers:
            t.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- services (Trigger equivalents, :131-135) --------------------------
    def reset(self) -> None:
        with self._lock:
            self.mapper.reset()
            self._scan_count = 0

    def run_postprocess(
        self, uf: bool = True, inpaint: bool = True, features: bool = True
    ) -> Dict[str, np.ndarray]:
        """Snapshot -> UF -> inpaint -> FE -> derived uncertainty_range
        (runPostProcess, :208-245)."""
        import jax

        with self._lock:
            snap = gm.snapshot(
                self.mapper.state,
                [layers.elevation, layers.upper_bound, layers.lower_bound],
            )
        key = (uf, inpaint, features)
        fn = self._pp_cache.get(key)
        if fn is None:
            import copy

            cfg = copy.deepcopy(self.pp_cfg)
            cfg.inpainting.enabled = inpaint
            cfg.uncertainty_fusion.enabled = uf
            cfg.feature_extraction.enabled = features
            fn = jax.jit(apply_postprocess_fn(self.geom, cfg))
            self._pp_cache[key] = fn
        out = fn(
            snap.layers[layers.elevation],
            snap.layers[layers.upper_bound],
            snap.layers[layers.lower_bound],
        )
        result = {k: np.asarray(v) for k, v in out.items()}
        self.postprocess_result = result
        self._publish("postprocess", result)
        return result

    def run_inpainting(self):
        return self.run_postprocess(uf=False, inpaint=True, features=False)

    def run_uncertainty_fusion(self):
        return self.run_postprocess(uf=True, inpaint=False, features=False)

    def run_feature_extraction(self):
        return self.run_postprocess(uf=False, inpaint=False, features=True)

    # -- publishing --------------------------------------------------------
    def _pp_loop(self):
        if self._scan_count == 0:
            return
        self.run_postprocess(
            uf=self.pp_cfg.uncertainty_fusion.enabled,
            inpaint=self.pp_cfg.inpainting.enabled,
            features=self.pp_cfg.feature_extraction.enabled,
        )

    def _viz_loop(self):
        if self._scan_count == 0:
            return
        # Materialize under the lock: the facade never donates, but holding
        # the lock through np.asarray keeps the snapshot transactionally
        # consistent with concurrent integrates (the reference's
        # shared_mutex + snapshot pattern, fastdem_ros_node.cpp:210-215).
        with self._lock:
            state = self.mapper.state
            payload = {
                "position": np.asarray(state.position),
                "scan_count": self._scan_count,
                "layers": {
                    k: np.asarray(v)
                    for k, v in state.layers.items()
                    if not gm.is_internal(k)
                },
            }
            # Last preprocessed scan (world frame, downsampled) for the
            # live viewer's 3D point view — the inspection the reference
            # streams through its Rerun bridge (bridge/rerun/).
            aux = self.mapper.last_aux
            if aux is not None:
                pts = np.asarray(aux.world_xyz)
                m = np.asarray(aux.world_mask)
                pts = pts[m]
                if pts.shape[0] > 20_000:
                    pts = pts[:: pts.shape[0] // 20_000 + 1]
                payload["scan_xyz"] = pts
        self._publish("map", payload)
        # Wire-format topics (real message encodings; see runtime/wire.py)
        # are produced only when a sink subscribes — like the reference's
        # subscriber-count gating (fastdem_ros_node.cpp:235-296).
        if "pointcloud2" in self.sinks:
            from fastdem_tpu.runtime import wire

            self._publish(
                "pointcloud2",
                wire.map_to_pointcloud2(
                    self.geom, state, frame_id=self.mapper.frame_id
                ),
            )
        if "gridmap_msg" in self.sinks:
            from fastdem_tpu.runtime import wire

            self._publish(
                "gridmap_msg",
                wire.map_to_gridmap_msg(
                    self.geom, state, frame_id=self.mapper.frame_id
                ),
            )
        if self.artifact_dir:
            from fastdem_tpu.io.html_viewer import save_html
            from fastdem_tpu.io.npz import save_npz

            save_npz(
                f"{self.artifact_dir}/map_latest.npz",
                self.geom,
                state,
                frame_id=self.mapper.frame_id,
            )
            # Interactive 3D artifact (the Rerun-bridge-equivalent viz;
            # io/html_viewer.py): one self-contained HTML next to the npz.
            save_html(
                f"{self.artifact_dir}/map_latest.html", self.geom, state
            )

    def _publish(self, topic: str, payload):
        sink = self.sinks.get(topic)
        if sink is not None:
            try:
                sink(payload)
            except Exception:  # noqa: BLE001
                log.exception("sink '%s' failed", topic)

    def _global_loop(self):
        """Global-submap publishing around the robot (the reference's
        global_publish_rate timer, fastdem_ros_node.cpp:271-280)."""
        if self._scan_count == 0:
            return
        with self._lock:
            center = np.asarray(self.mapper.state.position)
        payload = self.submap(tuple(center), self.global_window)
        payload["center"] = center
        self._publish("global_submap", payload)

    def submap(self, center_xy, length_xy) -> Dict[str, np.ndarray]:
        """Global-submap view (:271-280)."""
        with self._lock:
            state = self.mapper.state
        rs, cs = gm.submap_slices(
            self.geom, np.asarray(state.position), center_xy, length_xy
        )
        return {
            k: np.asarray(v)[rs, cs]
            for k, v in state.layers.items()
            if not gm.is_internal(k)
        }

    def _banner(self):
        cfg = self.mapper.cfg
        log.info(
            "FastDEM-TPU driver: map %dx%d @ %.2fm | mode=%s estimator=%s "
            "sensor=%s raycast=%s | pp %.1f Hz viz %.1f Hz",
            self.geom.rows,
            self.geom.cols,
            self.geom.resolution,
            cfg.mapping.mode.value,
            cfg.mapping.estimation_type.value,
            cfg.sensor_model.type.value,
            cfg.raycasting.enabled,
            self.postprocess_rate,
            self.viz_rate,
        )
