#!/usr/bin/env python
"""Cost model round 2: unified row scatters, index-count pipelining curve,
RGB-D 300K row shapes, and the polar dense-tail variants.

Follow-up to tools/bench_rowops.py, which established per-INDEX (not
per-element) serialization: row [n,32] ~ flat [n,1] ~ 11-12 ns/idx at 30K,
while flat 120K pipelines to 8 ns/idx. This round answers:
  1. does a row scatter with 60K indices (raster rows + polar rows in one
     [C_total, L] table) pipeline like flat 120K does?
  2. is one 60K-idx row op cheaper than two 30K ops in one program?
  3. RGB-D 300K: row [300K, 4] scatter cost (target <3 ms/scan total).
  4. dense polar-field tail: cummin+smear at [426,2048] vs [236,2048]
     (LOCAL half-diag bound) vs band-split smear.
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
    RA = 426 * 2048  # polar table slots
    n = 30_000

    ids_a = jnp.asarray(rng.integers(0, C - 1, n).astype(np.int32))
    ids_b = jnp.asarray(rng.integers(0, RA, n).astype(np.int32))
    vals_i = jnp.asarray(rng.integers(0, 1 << 28, n).astype(np.int32))
    init = (jnp.int32(0), jnp.int32(0))

    L = 34

    def unified_row(carry):
        acc, salt = carry
        ia = (ids_a + salt) % (C - 1)
        ib = C + (ids_b + salt) % RA
        upd_a = jnp.stack([vals_i + salt + k for k in range(L)], axis=1)
        upd_b = jnp.concatenate(
            [(vals_i - salt)[:, None], jnp.full((n, L - 1), IMAX, jnp.int32)],
            axis=1,
        )
        t = (
            jnp.full((C + RA, L), IMAX, dtype=jnp.int32)
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

    def flat2(carry):
        # min-z + polar only, flat concat (2 x 30K idx, 1 lane each)
        acc, salt = carry
        ia = (ids_a + salt) % (C - 1)
        ib = C + (ids_b + salt) % RA
        t = (
            jnp.full(C + RA, IMAX, dtype=jnp.int32)
            .at[jnp.concatenate([ia, ib])]
            .min(jnp.concatenate([vals_i + salt, vals_i - salt]))
        )
        return acc + t[0], salt + 1

    ms_uni = chained_ms(unified_row, init, label=f"scatter unified row 60K idx x{L}")
    ms_two = chained_ms(two_ops, init, label=f"scatter row 30Kx{L} + flat 30K (2 ops)")
    ms_f2 = chained_ms(flat2, init, label="scatter flat 60K idx (2x30K, 1 lane)")

    # ---- RGB-D shape: 300K points, 4 row lanes ----
    n3 = 300_000
    ids3 = jnp.asarray(rng.integers(0, C - 1, n3).astype(np.int32))
    vals3 = jnp.asarray(rng.integers(0, 1 << 28, n3).astype(np.int32))

    def row300(lanes):
        def body(carry):
            acc, salt = carry
            ia = (ids3 + salt) % (C - 1)
            upd = jnp.stack([vals3 + salt + k for k in range(lanes)], axis=1)
            t = jnp.full((C, lanes), IMAX, dtype=jnp.int32).at[ia].min(upd)
            return acc + t[0, 0], salt + 1

        return body

    ms_r300 = chained_ms(row300(4), init, label="scatter row [300K, 4]")

    # ---- gather: unified row vs split ----
    ncell = C - 1
    qa = jnp.asarray(rng.integers(0, n, ncell).astype(np.int32))
    qb = jnp.asarray(rng.integers(0, RA // 2, ncell).astype(np.int32))
    buf2 = jnp.asarray(rng.normal(size=(n + RA // 2, 2)).astype(np.float32))
    initf = (jnp.float32(0.0), jnp.int32(0))

    def gather_uni(carry):
        acc, salt = carry
        q = jnp.concatenate([(qa + salt) % n, n + (qb + salt) % (RA // 2)])
        g = buf2[q]
        return acc + g[0, 0], salt + 1

    ms_gu = chained_ms(gather_uni, initf, label="gather row 45K idx x2 (unified)")

    # ---- dense polar tail variants ----
    def field_tail(R, nlevels):
        field0 = jnp.asarray(
            rng.normal(size=(R, 2048)).astype(np.float32)
        )

        def body(carry):
            acc, salt = carry
            f = field0 + salt
            f = jax.lax.cummin(f, axis=0, reverse=True)
            f = jnp.minimum(f, jnp.concatenate([f[:1], f[:-1]], axis=0))
            for k in range(nlevels):
                f = jnp.minimum(f, jnp.roll(f, -(1 << k), axis=1))
            return acc + f[0, 0], salt + 1.0

        return body

    initd = (jnp.float32(0.0), jnp.float32(0.0))
    chained_ms(field_tail(426, 20), initd, label="dense tail R=426 20 full passes")
    chained_ms(field_tail(236, 20), initd, label="dense tail R=236 20 full passes")

    def field_tail_bands(R):
        field0 = jnp.asarray(rng.normal(size=(R, 2048)).astype(np.float32))
        # log-spaced bands: rows [0,8) 20 passes, [8,16) 16, [16,32) 14,
        # [32,64) 12, [64,128) 10, [128,R) 6  (approximates the static
        # per-column level structure)
        bands = [(0, 8, 20), (8, 16, 16), (16, 32, 14), (32, 64, 12),
                 (64, 128, 10), (128, R, 6)]

        def body(carry):
            acc, salt = carry
            f = field0 + salt
            f = jax.lax.cummin(f, axis=0, reverse=True)
            f = jnp.minimum(f, jnp.concatenate([f[:1], f[:-1]], axis=0))
            outs = []
            for lo, hi, lv in bands:
                b = f[lo:hi]
                for k in range(lv):
                    b = jnp.minimum(b, jnp.roll(b, -(1 << (k % 11)), axis=1))
                outs.append(b)
            f = jnp.concatenate(outs, axis=0)
            return acc + f[0, 0], salt + 1.0

        return body

    chained_ms(field_tail_bands(426), initd, label="dense tail R=426 band-split")
    chained_ms(field_tail_bands(236), initd, label="dense tail R=236 band-split")

    print("\nsummary:")
    for label, ms, idx in [
        ("uni60K", ms_uni, 60000), ("two_ops", ms_two, 60000),
        ("flat2x30K", ms_f2, 60000), ("row300Kx4", ms_r300, 300000),
        ("gath_uni45K", ms_gu, 45000),
    ]:
        print(f"  {label:<12s} {ms:8.4f} ms  {ms*1e6/idx:7.1f} ns/idx")


if __name__ == "__main__":
    main()
