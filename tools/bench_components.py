#!/usr/bin/env python
"""Per-component chained timing of the pipeline pieces on the device."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fastdem_tpu.config.config import Config
from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.grid import gridmap
from fastdem_tpu.mapping import kalman as KF
from fastdem_tpu.mapping import rasterize as R
from fastdem_tpu.mapping.pipeline import create_map_state
from fastdem_tpu.postprocess import raycasting as RC

K = 64


def chained(fn, *args, reps=3):
    @jax.jit
    def run(a0, rest):
        def body(c, _):
            return fn(c, *rest), ()

        out, _ = jax.lax.scan(body, a0, None, length=K)
        return out

    out = run(args[0], args[1:])
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = run(args[0], args[1:])
    jax.block_until_ready(out)
    return (time.time() - t0) / (reps * K) * 1e3


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    geom = GridGeometry.from_length(15.0, 15.0, 0.1)
    n = 30000
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = rng.uniform(0.5, 7.2, n)
    xyz = jnp.asarray(
        np.column_stack(
            [rad * np.cos(ang), rad * np.sin(ang),
             0.2 * np.sin(rad) - 1.0]
        ).astype(np.float32)
    )
    mask = jnp.ones(n, dtype=bool)
    var = jnp.full(n, 0.003, dtype=jnp.float32)
    pos = jnp.zeros(2)
    origin = jnp.asarray([0.0, 0.0, 1.0])

    # 1. rasterize_scatter (with voxel count, as the raycast config uses)
    def f_raster(salt, xyz, mask, var):
        obs = R.rasterize_scatter(
            geom, pos, xyz + salt * 0.0, mask, var, with_voxel_count=True
        )
        return salt + obs.min_z[0, 0] * 0.0

    print(f"rasterize_scatter+voxcnt: {chained(f_raster, jnp.float32(0), xyz, mask, var):7.3f} ms")

    def f_raster2(salt, xyz, mask, var):
        obs = R.rasterize_scatter(
            geom, pos, xyz + salt * 0.0, mask, var, with_voxel_count=False
        )
        return salt + obs.min_z[0, 0] * 0.0

    print(f"rasterize_scatter:        {chained(f_raster2, jnp.float32(0), xyz, mask, var):7.3f} ms")

    # 2. Kalman dense update
    cfg = Config()
    state = create_map_state(geom, cfg)
    z = jnp.zeros(geom.shape)
    t = jnp.ones(geom.shape, dtype=bool)

    def f_kal(state):
        return KF.update(state, cfg.mapping.kalman, z, z + 0.003, t)

    print(f"kalman dense update:      {chained(f_kal, state):7.3f} ms")

    # 3. move
    def f_move(state):
        return gridmap.move(geom, state, state.position + 0.05)

    print(f"move (roll+mask):         {chained(f_move, state):7.3f} ms")

    # 4. polar ray min height
    def f_polar(salt, xyz, mask):
        h, t = RC.ray_min_height_polar(geom, pos, xyz + salt * 0.0, mask, origin)
        return salt + h[0, 0] * 0.0

    print(f"polar ray min:            {chained(f_polar, jnp.float32(0), xyz, mask):7.3f} ms")

    # 4b. polar pieces: scatter+cummin only (no resample)
    A, drr = 2048, 0.05
    import math

    Rr = int(math.ceil(math.hypot(150, 150) * 0.1 / drr)) + 2

    def f_scatcum(salt, xyz, mask):
        dxy = xyz[:, :2] - origin[:2]
        dz = xyz[:, 2] - origin[2] + salt * 0.0
        len2d = jnp.linalg.norm(dxy, axis=1)
        valid = mask & (dz < 0)
        azim = jnp.arctan2(dxy[:, 1], dxy[:, 0])
        abin = jnp.clip(((azim + jnp.pi) / (2 * jnp.pi) * A).astype(jnp.int32), 0, A - 1)
        slope = dz / jnp.maximum(len2d, 1e-12)
        rbin = jnp.clip((len2d / drr).astype(jnp.int32), 0, Rr - 1)
        key = jnp.where(valid, abin * Rr + rbin, A * Rr)
        scat = (
            jnp.full(A * Rr + 1, jnp.inf).at[key].min(jnp.where(valid, slope, jnp.inf))[: A * Rr]
        ).reshape(A, Rr)
        ms = jax.lax.associative_scan(jnp.minimum, scat, axis=1, reverse=True)
        return salt + ms[0, 0] * 0.0

    print(f"  scatter+cummin only:    {chained(f_scatcum, jnp.float32(0), xyz, mask):7.3f} ms")

    # 5. full apply_raycasting
    rcfg = cfg.raycasting
    rcfg.enabled = True
    state2 = gridmap.create(
        geom,
        {**gridmap.default_layer_fills(), **RC.layer_fills()},
    )

    def f_rc(state2, xyz, mask):
        return RC.apply_raycasting(
            geom, state2, xyz, mask, origin, rcfg,
            obs_count=jnp.ones(geom.shape),
        )

    print(f"apply_raycasting full:    {chained(f_rc, state2, xyz, mask):7.3f} ms")


if __name__ == "__main__":
    main()
