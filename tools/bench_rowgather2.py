#!/usr/bin/env python
"""Probe 2 of the tile-row trick: var gather and the two scatters.

tools/bench_perop.py found element gathers cost 13-19 ns/idx while a
[22.5K]-index gather of ALIGNED 128-lane tile rows plus a dense one-hot
lane select costs ~3.8 ns/idx (0.086 vs 0.29-0.42 ms). This probes the
same restructuring for the remaining irregular ops at headline shapes.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fastdem_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

IMAX = jnp.int32(0x7FFFFFFF)
N = 30_000
NPAD = 30_080  # N rounded to 128
NCELL = 22500
R, A = 515, 2048
RA = R * A


def chained_ms(body, init, iters=64, reps=3, label=""):
    def make(length):
        @jax.jit
        def run(carry):
            out, _ = jax.lax.scan(lambda c, _: (body(c), ()), carry, None, length=length)
            return out
        return run
    run1, run2 = make(iters), make(2 * iters)
    t0 = time.time()
    jax.block_until_ready(run1(init)); jax.block_until_ready(run2(init))
    compile_s = time.time() - t0
    t1 = t2 = 0.0
    out = init
    for _ in range(reps):
        t0 = time.time(); out = run1(out); jax.block_until_ready(out); t1 += time.time() - t0
        t0 = time.time(); out = run2(out); jax.block_until_ready(out); t2 += time.time() - t0
    ms = (t2 - t1) / (reps * iters) * 1e3
    print(f"{label:<46s} {ms:8.4f} ms  (compile {compile_s:5.1f}s)", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    zvar0 = jnp.asarray(rng.random(NPAD).astype(np.float32))
    cell_iota = jnp.arange(NCELL, dtype=jnp.int32)
    pids0 = jnp.asarray(rng.integers(0, RA, N).astype(np.int32))
    vals0 = jnp.asarray(rng.random(N).astype(np.float32))
    ids0 = jnp.asarray(rng.integers(0, NCELL, N).astype(np.int32))
    upd0 = jnp.asarray(rng.integers(1, 1 << 30, (N, 36)).astype(np.int32))

    # 1. var gather as tile-row gather + lane select.
    zrows = zvar0.reshape(-1, 128)

    def body_var_rows(c):
        salt = c.astype(jnp.int32)
        amin = (cell_iota * 7 + salt) % N
        g = zrows[amin >> 7]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (NCELL, 128), 1)
            == (amin & 127)[:, None]
        )
        v = jnp.sum(jnp.where(onehot, g, 0.0), axis=1)
        return c + v.sum() * 1e-18 + 1.0

    chained_ms(body_var_rows, jnp.float32(0.0),
               label="var gather: tile-row + lane select")

    # 2. polar scatter as one-hot row scatter-min into [RA/128, 128].
    def body_polar_rows(c):
        salt = c.astype(jnp.int32)
        pids = (pids0 + salt) % RA
        onehot_upd = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
            == (pids & 127)[:, None],
            (vals0 + c)[:, None],
            jnp.inf,
        )
        pt = (
            jnp.full((RA // 128 + 1, 128), jnp.inf, dtype=jnp.float32)
            .at[pids >> 7]
            .min(onehot_upd)
        )
        return c + pt[::32, ::64].sum() * 1e-18 + 1.0

    chained_ms(body_polar_rows, jnp.float32(0.0),
               label="polar scatter: one-hot row scatter-min")

    # 3. rasterizer row scatter widened to 128 aligned lanes (vs 36).
    upd128 = jnp.concatenate(
        [upd0, jnp.full((N, 92), IMAX, dtype=jnp.int32)], axis=1
    )

    def body_row128(c):
        salt = c.astype(jnp.int32)
        ids = (ids0 + salt) % NCELL
        t = (
            jnp.full((NCELL + 1, 128), IMAX, dtype=jnp.int32)
            .at[ids]
            .min(upd128 + (salt & 0))
        )
        return c + t[:, 1].astype(jnp.float32).sum() * 1e-18 + 1.0

    chained_ms(body_row128, jnp.float32(0.0),
               label="row scatter: 128 aligned lanes")

    # 4. amin_at_pt gather (per-point path) as tile-row.
    aminbuf = jnp.asarray(rng.integers(0, N, 22528).astype(np.int32))
    arows = aminbuf.reshape(-1, 128)

    def body_aminpt(c):
        salt = c.astype(jnp.int32)
        gids = (ids0 + salt) % NCELL
        g = arows[gids >> 7]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
            == (gids & 127)[:, None]
        )
        v = jnp.sum(jnp.where(onehot, g, 0), axis=1)
        return c + v.astype(jnp.float32).sum() * 1e-18 + 1.0

    chained_ms(body_aminpt, jnp.float32(0.0),
               label="amin@pt gather [30K]: tile-row")


if __name__ == "__main__":
    main()
