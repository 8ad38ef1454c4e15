#!/usr/bin/env python
"""FastDEM-TPU benchmark. Prints ONE JSON line with the headline metric.

Flagship config = the reference's own benchmark setting (README.md:41,53-59):
VLP-16-scale scans (~30K pts) into a 15x15 m @ 0.1 m robot-centric LOCAL map,
Kalman estimator + LiDAR noise model, raycasting enabled. Reference baseline:
~10 ms/scan on a Jetson Orin CPU (BASELINE.md).

Measurement: the per-scan integrate step is chained K times inside one jitted
lax.scan over pre-staged device-resident scans, so the number reflects pure
device throughput (the production serving shape: scans stream into HBM and
dispatch is pipelined). Per-dispatch latency is reported on stderr for
context.

Usage: python bench.py [--scans K] [--points N] [--no-raycast]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=64)
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--no-raycast", action="store_true")
    ap.add_argument("--global-map", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from fastdem_tpu import Config, GridGeometry, MappingMode
    from fastdem_tpu.mapping.pipeline import build_integrate, create_map_state

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    geom = GridGeometry.from_length(15.0, 15.0, 0.1)
    cfg = Config()
    cfg.mapping.mode = MappingMode.GLOBAL if args.global_map else MappingMode.LOCAL
    cfg.raycasting.enabled = not args.no_raycast

    # VLP-16-like scans: 16 rings, uniform azimuth, bumpy ground at z=-1.
    rng = np.random.default_rng(0)
    K, N = args.scans, args.points
    ang = rng.uniform(0, 2 * np.pi, (K, N))
    rad = rng.uniform(0.5, 7.2, (K, N))
    x = rad * np.cos(ang)
    y = rad * np.sin(ang)
    z = 0.2 * np.sin(0.8 * x) * np.cos(0.6 * y) - 1.0 + rng.normal(
        0, 0.02, (K, N)
    )
    scans = jnp.asarray(
        np.stack([x, y, z], axis=-1).astype(np.float32)
    )  # [K, N, 3]
    masks = jnp.ones((K, N), dtype=bool)
    T_bs = jnp.eye(4).at[2, 3].set(1.0)
    # Robot wanders slowly (exercises LOCAL move each scan).
    tx = jnp.asarray(
        np.cumsum(rng.normal(0, 0.05, K)).astype(np.float32)
    )

    step = build_integrate(geom, cfg, jit=False)

    def body(state, inp):
        xyz, mask, txi = inp
        T_wb = jnp.eye(4).at[0, 3].set(txi)
        state, _ = step(state, xyz, mask, T_bs, T_wb)
        return state, ()

    @jax.jit
    def run(state, scans, masks, tx):
        state, _ = jax.lax.scan(body, state, (scans, masks, tx))
        return state

    state = create_map_state(geom, cfg)
    # Warm-up / compile.
    t0 = time.time()
    out = run(state, scans, masks, tx)
    jax.block_until_ready(out.layers)
    print(f"compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    # Timed: 3 repetitions of the K-scan chain.
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = run(state, scans, masks, tx)
        jax.block_until_ready(out.layers)
    total = time.time() - t0
    ms_per_scan = total / (reps * K) * 1e3

    # Per-dispatch latency (single-step jit, donated), for context.
    step_jit = build_integrate(geom, cfg, jit=True, donate=False)
    s = create_map_state(geom, cfg)
    I4 = jnp.eye(4)
    s, _ = step_jit(s, scans[0], masks[0], T_bs, I4)
    jax.block_until_ready(s.layers)
    t0 = time.time()
    M = 20
    for i in range(M):
        s, _ = step_jit(s, scans[i % K], masks[i % K], T_bs, I4)
    jax.block_until_ready(s.layers)
    disp_ms = (time.time() - t0) / M * 1e3
    print(f"per-dispatch latency: {disp_ms:.2f} ms/scan", file=sys.stderr)

    baseline_ms = 10.0  # reference ~10 ms/scan (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "ms_per_scan_vlp16_15m_kalman_raycast",
                "value": round(ms_per_scan, 4),
                "unit": "ms/scan",
                "vs_baseline": round(baseline_ms / ms_per_scan, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
