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


def make_inputs(K=64, N=30000, rmax=7.2):
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, (K, N))
    rad = rng.uniform(0.5, rmax, (K, N))
    x = rad * np.cos(ang); y = rad * np.sin(ang)
    z = 0.2 * np.sin(0.8 * x) * np.cos(0.6 * y) - 1.0 + rng.normal(0, 0.02, (K, N))
    scans = jnp.asarray(np.stack([x, y, z], -1).astype(np.float32))
    masks = jnp.ones((K, N), bool)
    tx = jnp.asarray(np.cumsum(rng.normal(0, 0.05, K)).astype(np.float32))
    return scans, masks, tx


def run_variant(name, N=30000, geom_m=15.0, res=0.1, K=64, rmax=7.2,
                cfg_mut=None, **kw):
    geom = GridGeometry.from_length(geom_m, geom_m, res)
    cfg = Config()
    cfg.raycasting.enabled = kw.pop("raycast", True)
    if cfg_mut:
        cfg_mut(cfg)
    step = build_integrate(geom, cfg, jit=False, **kw)
    scans, masks, tx = make_inputs(K=K, N=N, rmax=rmax)
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
    from fastdem_tpu.config.config import EstimationType, MappingMode

    def mut_p2(cfg):
        cfg.mapping.estimation_type = EstimationType.P2_QUANTILE

    def mut_global(cfg):
        cfg.mapping.mode = MappingMode.GLOBAL
        cfg.point_filter.range_max = 20.0

    run_variant("no-raycast packed", raycast=False, scatter_mode="packed")
    run_variant("raycast packed", scatter_mode="packed")
    run_variant("raycast twophase", scatter_mode="twophase")
    run_variant("p2 raycast packed", cfg_mut=mut_p2, scatter_mode="packed")
    run_variant("300K packed", N=300000, raycast=False, scatter_mode="packed")
    run_variant("global200m no-raycast", geom_m=200.0, raycast=False,
                cfg_mut=mut_global, K=16, rmax=19.0)
    run_variant("global200m raycast r20", geom_m=200.0, cfg_mut=mut_global,
                K=16, rmax=19.0)


if __name__ == "__main__":
    main()
