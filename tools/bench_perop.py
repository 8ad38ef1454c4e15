#!/usr/bin/env python
"""Per-op cost breakdown at the headline shapes, dispatch-cancelled.

Each component of the integrate step's irregular+dense budget is measured
alone with the two-length difference estimator (T(2L)-T(L) cancels the
host->tunnel dispatch that inflated earlier per-component probes by
~0.1-2 ms). Shapes mirror the headline config: 150x150 map, 30K pts,
polar field [515, 2048] (A=2048, dr=res/4, LOCAL half-diagonal bound).

Run on the real chip: python tools/bench_perop.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fastdem_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

IMAX = jnp.int32(0x7FFFFFFF)
C = 22501
N = 30_000
NCELL = 22500
L = 36
R, A = 515, 2048
RA = R * A
S = RA + 1


def chained_ms(body, init, iters=64, reps=3, label=""):
    def make(length):
        @jax.jit
        def run(carry):
            out, _ = jax.lax.scan(
                lambda c, _: (body(c), ()), carry, None, length=length
            )
            return out

        return run

    run1, run2 = make(iters), make(2 * iters)
    t0 = time.time()
    jax.block_until_ready(run1(init))
    jax.block_until_ready(run2(init))
    compile_s = time.time() - t0
    t1 = t2 = 0.0
    out = init
    for _ in range(reps):
        t0 = time.time()
        out = run1(out)
        jax.block_until_ready(out)
        t1 += time.time() - t0
        t0 = time.time()
        out = run2(out)
        jax.block_until_ready(out)
        t2 += time.time() - t0
    ms = (t2 - t1) / (reps * iters) * 1e3
    print(f"{label:<40s} {ms:8.4f} ms  (compile {compile_s:5.1f}s)", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(rng.integers(0, NCELL, N).astype(np.int32))
    pids0 = jnp.asarray(rng.integers(0, RA, N).astype(np.int32))
    upd0 = jnp.asarray(rng.integers(1, 1 << 30, (N, L)).astype(np.int32))
    vals0 = jnp.asarray(rng.random(N).astype(np.float32))
    zvar0 = jnp.asarray(rng.random(N).astype(np.float32))
    cell_iota = jnp.arange(NCELL, dtype=jnp.int32)
    field0 = jnp.asarray(rng.random((R, A)).astype(np.float32))

    which = set(sys.argv[1:]) or {
        "rowscatter", "polarscatter", "vargather", "ridergather", "dense"
    }

    if "rowscatter" in which:
        def body(c):
            salt = c.astype(jnp.int32)
            ids = (ids0 + salt) % NCELL
            t = (
                jnp.full((C, L), IMAX, dtype=jnp.int32)
                .at[ids]
                .min(upd0)
            )
            return c + t[:, 1].astype(jnp.float32).sum() * 1e-18 + 1.0

        chained_ms(body, jnp.float32(0.0), label="row scatter [30K]->[22.5K,36]")

    if "polarscatter" in which:
        def body(c):
            salt = c.astype(jnp.int32)
            pids = (pids0 + salt) % RA
            pt = (
                jnp.full(S, jnp.inf, dtype=jnp.float32)
                .at[pids]
                .min(vals0 + c)
            )
            return c + pt[::4096].sum() * 1e-18 + 1.0

        chained_ms(body, jnp.float32(0.0), label="polar scatter [30K]->[1.05M]")

    if "vargather" in which:
        def body(c):
            salt = c.astype(jnp.int32)
            amin = (cell_iota * 7 + salt) % N
            g = zvar0[amin]
            return c + g.sum() * 1e-18 + 1.0

        chained_ms(body, jnp.float32(0.0), label="var gather [22.5K] from [30K]")

    if "ridergather" in which:
        def body(c):
            salt = c.astype(jnp.int32)
            ridx = (cell_iota * 37 + salt) % RA
            g = field0.reshape(-1)[ridx]
            return c + g.sum() * 1e-18 + 1.0

        chained_ms(body, jnp.float32(0.0),
                   label="rider gather [22.5K] from [515,2048]")

    if "dense" in which:
        # The polar field's dense tail at the headline defaults: reverse
        # cummin + in-cell fold (nfold=4 -> 2 passes) + azimuth smear
        # levels + exact-window bit passes (~19 masked roll-mins).
        from fastdem_tpu.postprocess.raycasting import (
            _column_windows, polar_smeared_field,
        )
        from fastdem_tpu.grid.geometry import GridGeometry

        geom = GridGeometry.from_length(15.0, 15.0, 0.1)
        so = jnp.asarray([0.1, -0.05, 1.0], dtype=jnp.float32)

        def body(c):
            tbl = field0.reshape(-1) + c
            sm = polar_smeared_field(
                geom, so, tbl, A, 0.25, 12.81, exact_window=True
            )
            return c + sm[::8, ::128].sum() * 1e-18 + 1.0

        chained_ms(body, jnp.float32(0.0),
                   label="dense tail (smeared field, exact)")


if __name__ == "__main__":
    main()


def rider_variants():
    """Rider-gather optimization probes: what does the 18.7 ns/idx from the
    4.2 MB field actually depend on?"""
    import math

    rng = np.random.default_rng(1)
    field0 = jnp.asarray(rng.random((R, A)).astype(np.float32))
    cell_iota = jnp.arange(NCELL, dtype=jnp.int32)

    # Realistic resample index pattern (raster-order cells around a center
    # sensor): r smooth in distance, a = azimuth bin.
    ii, jj = np.meshgrid(np.arange(150), np.arange(150), indexing="ij")
    cx = (74.5 - ii) * 0.1
    cy = (74.5 - jj) * 0.1
    dist = np.hypot(cx, cy)
    az = np.arctan2(cy, cx)
    rr = np.clip(((dist + 0.05) / 0.025).astype(np.int32), 0, R - 1)
    aa = np.clip(((az + np.pi) / (2 * np.pi) * A).astype(np.int32), 0, A - 1)
    real_flat_rm = jnp.asarray((rr * A + aa).reshape(-1))  # range-major
    real_flat_am = jnp.asarray((aa * R + rr).reshape(-1))  # azimuth-major
    real_rows = jnp.asarray((rr * (A // 128) + aa // 128).reshape(-1))
    real_lane = jnp.asarray((aa % 128).reshape(-1))

    def body_flat(idx_base, mod):
        def body(c):
            salt = c.astype(jnp.int32)
            g = field0.reshape(-1)[(idx_base + salt) % mod]
            return c + g.sum() * 1e-18 + 1.0

        return body

    chained_ms(
        body_flat(real_flat_rm, RA), jnp.float32(0.0),
        label="rider: realistic idx, range-major",
    )
    fieldT = jnp.asarray(np.ascontiguousarray(
        np.asarray(field0).T
    ))

    def body_am(c):
        salt = c.astype(jnp.int32)
        g = fieldT.reshape(-1)[(real_flat_am + salt) % RA]
        return c + g.sum() * 1e-18 + 1.0

    chained_ms(body_am, jnp.float32(0.0),
               label="rider: realistic idx, az-major")

    f16 = field0.astype(jnp.float16)

    def body_f16(c):
        salt = c.astype(jnp.int32)
        g = f16.reshape(-1)[(real_flat_rm + salt) % RA]
        return c + g.astype(jnp.float32).sum() * 1e-18 + 1.0

    chained_ms(body_f16, jnp.float32(0.0),
               label="rider: f16 field, range-major")

    # Tile-row gather + dense one-hot lane select: fetch [22.5K, 128] rows
    # of the [R*16, 128] retiled field, then select the lane densely.
    field_rows = field0.reshape(R * (A // 128), 128)

    def body_rows(c):
        salt = c.astype(jnp.int32)
        rows = (real_rows + salt) % (R * (A // 128))
        g = field_rows[rows]  # [NCELL, 128]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (NCELL, 128), 1)
            == real_lane[:, None]
        )
        v = jnp.sum(jnp.where(onehot, g, 0.0), axis=1)
        return c + v.sum() * 1e-18 + 1.0

    chained_ms(body_rows, jnp.float32(0.0),
               label="rider: tile-row gather + lane select")

    # Sorted (range-major-ordered) index stream: same footprint, maximal
    # locality — isolates whether access ORDER matters at all.
    srt = jnp.sort(real_flat_rm)

    def body_sorted(c):
        salt = c.astype(jnp.int32)
        g = field0.reshape(-1)[(srt + salt) % RA]
        return c + g.sum() * 1e-18 + 1.0

    chained_ms(body_sorted, jnp.float32(0.0),
               label="rider: sorted idx, range-major")


if len(sys.argv) > 1 and sys.argv[1] == "rider":
    rider_variants()
    sys.exit(0)
