#!/usr/bin/env python
"""Same-session A/B: tile-row gathers vs flat element gathers, per config.

bench.py --all after the tile-row change showed the Kalman headline
improving (0.88-0.93 dispatch-cancelled) but P2 and RGB-D reading HIGHER
than their pre-change sessions. Session variance is 5-10x on dispatch and
~20% overall, so only a same-process A/B is trustworthy: this sweeps
{p2, rgbd, kalman} x {tile-row, flat} in ONE process with the two-length
difference estimator; the variant flips via ops.rowgather.set_enabled
(read at trace time, so each build compiles its own program).

Usage: python tools/bench_sweep_r2c.py [configs...]   (default: p2 rgbd)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fastdem_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from fastdem_tpu import Config, GridGeometry
from fastdem_tpu.config.config import EstimationType, SensorType
from fastdem_tpu.mapping.pipeline import build_integrate, create_map_state
from fastdem_tpu.ops import rowgather


def measure(config: str, tile: bool):
    cfg = Config()
    cfg.raycasting.enabled = True
    K, N, spread = 64, 30000, 7.2
    if config == "p2":
        cfg.mapping.estimation_type = EstimationType.P2_QUANTILE
    elif config == "rgbd":
        cfg.raycasting.enabled = False
        cfg.sensor_model.type = SensorType.RGBD
        K, N, spread = 16, 300000, 6.0
    elif config != "kalman":
        raise SystemExit(f"unknown config {config}")

    geom = GridGeometry.from_length(15.0, 15.0, 0.1)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, (2 * K, N))
    rad = rng.uniform(0.5, spread, (2 * K, N))
    x = rad * np.cos(ang)
    y = rad * np.sin(ang)
    z = 0.2 * np.sin(0.8 * x) * np.cos(0.6 * y) - 1.0 + rng.normal(
        0, 0.02, (2 * K, N)
    )
    scans = jnp.asarray(np.stack([x, y, z], -1).astype(np.float32))
    masks = jnp.ones((2 * K, N), bool)
    tx = jnp.asarray(np.cumsum(rng.normal(0, 0.05, 2 * K)).astype(np.float32))
    state = create_map_state(geom, cfg)

    rowgather.set_enabled(tile)
    step = build_integrate(geom, cfg, jit=False)
    T_bs = jnp.eye(4).at[2, 3].set(1.0)

    def body(s, inp):
        xyz, mask, txi = inp
        T_wb = jnp.eye(4).at[0, 3].set(txi)
        s, _ = step(s, xyz, mask, T_bs, T_wb)
        return s, ()

    @jax.jit
    def run1(s):
        s, _ = jax.lax.scan(body, s, (scans[:K], masks[:K], tx[:K]))
        return s

    @jax.jit
    def run2(s):
        s, _ = jax.lax.scan(body, s, (scans, masks, tx))
        return s

    t0 = time.time()
    jax.block_until_ready(run1(state).layers)
    jax.block_until_ready(run2(state).layers)
    compile_s = time.time() - t0
    t1 = t2 = 0.0
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run1(state).layers)
        t1 += time.time() - t0
        t0 = time.time()
        jax.block_until_ready(run2(state).layers)
        t2 += time.time() - t0
    ms = (t2 - t1) / (3 * K) * 1e3
    raw = t1 / (3 * K) * 1e3
    tag = "tile" if tile else "flat"
    print(
        f"RESULT {config:>6s} {tag}: {ms:7.4f} ms/scan device "
        f"(raw {raw:7.4f}, compile {compile_s:.0f}s)",
        flush=True,
    )
    return ms


def main():
    print("device:", jax.devices()[0], flush=True)
    configs = sys.argv[1:] or ["p2", "rgbd"]
    for config in configs:
        for tile in (True, False):
            measure(config, tile)


if __name__ == "__main__":
    main()
