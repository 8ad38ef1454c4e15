#!/usr/bin/env python
"""Full-pipeline A/B sweep of raycast parameterizations (one session)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fastdem_tpu import Config, GridGeometry
from fastdem_tpu.mapping.pipeline import build_integrate, create_map_state


def make_inputs(K=8, N=30000, rmax=7.2):
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, (K, N))
    rad = rng.uniform(0.5, rmax, (K, N))
    x = rad * np.cos(ang); y = rad * np.sin(ang)
    z = 0.2 * np.sin(0.8 * x) * np.cos(0.6 * y) - 1.0 + rng.normal(0, 0.02, (K, N))
    scans = jnp.asarray(np.stack([x, y, z], -1).astype(np.float32))
    masks = jnp.ones((K, N), bool)
    tx = jnp.asarray(np.cumsum(rng.normal(0, 0.05, K)).astype(np.float32))
    return scans, masks, tx


def run_variant(name, N=30000, **kw):
    geom = GridGeometry.from_length(15.0, 15.0, 0.1)
    cfg = Config()
    cfg.raycasting.enabled = kw.pop("raycast", True)
    step = build_integrate(geom, cfg, jit=False, **kw)
    scans, masks, tx = make_inputs(N=N)
    T_bs = jnp.eye(4).at[2, 3].set(1.0)

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
    t0 = time.time()
    out = run(state, scans, masks, tx)
    jax.block_until_ready(out.layers)
    compile_s = time.time() - t0
    reps = 4
    t0 = time.time()
    for _ in range(reps):
        out = run(state, scans, masks, tx)
    jax.block_until_ready(out.layers)
    ms = (time.time() - t0) / (reps * scans.shape[0]) * 1e3
    print(f"{name:>28}: {ms:7.3f} ms/scan  (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0], flush=True)
    run_variant("no-raycast twophase", raycast=False, scatter_mode="twophase")
    run_variant("no-raycast packed", raycast=False, scatter_mode="packed")
    run_variant("raycast twophase", scatter_mode="twophase")
    run_variant("raycast packed", scatter_mode="packed")
    run_variant("300K twophase", N=300000, raycast=False, scatter_mode="twophase")
    run_variant("300K packed", N=300000, raycast=False, scatter_mode="packed")


if __name__ == "__main__":
    main()
