#!/usr/bin/env python
"""Cost model round 3: can the polar scatter fuse into the raster ROW
scatter via a compact (RA/L-row) sub-table, riding the >9ns/idx
pipelining that bigger index counts buy?

two_ops baseline (round 2): row [30K, 34] + flat 30K = 0.594 ms.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fastdem_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

K = 64
IMAX = jnp.int32(0x7FFFFFFF)


def chained_ms(body, init, reps=3, label=""):
    @jax.jit
    def run(carry):
        out, _ = jax.lax.scan(lambda c, _: (body(c), ()), carry, None, length=K)
        return out

    t0 = time.time()
    out = run(init)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = run(out)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / (reps * K) * 1e3
    print(f"{label:<46s} {ms:8.4f} ms/iter  (compile {compile_s:5.1f}s)", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    C = 22501
    RA = 426 * 2048
    n = 30_000
    L = 35

    ids_a = jnp.asarray(rng.integers(0, C - 1, n).astype(np.int32))
    ids_b = jnp.asarray(rng.integers(0, RA, n).astype(np.int32))
    vals_i = jnp.asarray(rng.integers(0, 1 << 28, n).astype(np.int32))
    init = (jnp.int32(0), jnp.int32(0))
    lane_iota = jnp.arange(L, dtype=jnp.int32)[None, :]

    def unified_compact(carry):
        acc, salt = carry
        ia = (ids_a + salt) % (C - 1)
        kb = (ids_b + salt) % RA
        ib = C + kb // L
        lane_b = kb % L
        upd_a = jnp.stack([vals_i + salt + k for k in range(L)], axis=1)
        upd_b = jnp.where(
            lane_b[:, None] == lane_iota, (vals_i - salt)[:, None], IMAX
        )
        rows = C + (RA + L - 1) // L + 1
        t = (
            jnp.full((rows, L), IMAX, dtype=jnp.int32)
            .at[jnp.concatenate([ia, ib])]
            .min(jnp.concatenate([upd_a, upd_b], axis=0))
        )
        return acc + t[0, 0], salt + 1

    def two_ops(carry):
        acc, salt = carry
        ia = (ids_a + salt) % (C - 1)
        ib = (ids_b + salt) % RA
        upd_a = jnp.stack([vals_i + salt + k for k in range(L)], axis=1)
        t1 = jnp.full((C, L), IMAX, dtype=jnp.int32).at[ia].min(upd_a)
        t2 = jnp.full(RA, IMAX, dtype=jnp.int32).at[ib].min(vals_i - salt)
        return acc + t1[0, 0] + t2[0], salt + 1

    def two_ops_zb16(carry):
        # raster rows at 19 lanes (ZB=16 bitmap) + flat polar
        acc, salt = carry
        L2 = 19
        ia = (ids_a + salt) % (C - 1)
        ib = (ids_b + salt) % RA
        upd_a = jnp.stack([vals_i + salt + k for k in range(L2)], axis=1)
        t1 = jnp.full((C, L2), IMAX, dtype=jnp.int32).at[ia].min(upd_a)
        t2 = jnp.full(RA, IMAX, dtype=jnp.int32).at[ib].min(vals_i - salt)
        return acc + t1[0, 0] + t2[0], salt + 1

    chained_ms(unified_compact, init, label=f"unified compact rows 60K idx x{L}")
    chained_ms(two_ops, init, label=f"two ops: row 30Kx{L} + flat 30K")
    chained_ms(two_ops_zb16, init, label="two ops: row 30Kx19 + flat 30K")

    # Fused flat gather at 45K idx (current pipeline shape) vs split.
    ncell = C - 1
    qa = jnp.asarray(rng.integers(0, n, ncell).astype(np.int32))
    qb = jnp.asarray(rng.integers(0, RA, ncell).astype(np.int32))
    var_buf = jnp.asarray(rng.normal(size=n).astype(np.float32))
    field = jnp.asarray(rng.normal(size=RA).astype(np.float32))
    initf = (jnp.float32(0.0), jnp.int32(0))

    def fused_flat(carry):
        acc, salt = carry
        q = jnp.concatenate([(qa + salt) % n, n + (qb + salt) % RA])
        g = jnp.concatenate([var_buf, field])[q]
        return acc + g[0], salt + 1

    def split_gathers(carry):
        acc, salt = carry
        g1 = var_buf[(qa + salt) % n]
        g2 = field[(qb + salt) % RA]
        return acc + g1[0] + g2[0], salt + 1

    chained_ms(fused_flat, initf, label="gather fused flat 45K idx")
    chained_ms(split_gathers, initf, label="gather split 22.5K + 22.5K")


if __name__ == "__main__":
    main()
