#!/usr/bin/env python
"""Cost model: row-widened scatter/gather vs flat (per-index vs per-element).

The round-1 cost model (BENCH_NOTES.md) established scatter/gather serialize
at ~5-14 ns per ELEMENT with data-dependent indices, measured on FLAT 1D
ops. Hypothesis for round 2: XLA:TPU serializes per scatter INDEX, with the
update window vectorized — if true, fusing the rasterizer's L independent
lanes as ONE [n, L]-row scatter into a [C, L] table costs ~n serialized
steps instead of L*n, and the argmin gather of (z, var[, color]) rows costs
~ncell steps instead of 2-3x ncell.

Methodology: K=64 chained dependent iterations inside one lax.scan, indices
SALTED per iteration (data-dependent — loop-invariant indices measure 100x
fast, BENCH_NOTES.md), compile excluded, persistent cache on. Run on the
real chip: python tools/bench_rowops.py
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
    print(f"{label:<42s} {ms:8.4f} ms/iter  (compile {compile_s:5.1f}s)", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    C = 22501  # 150x150 cells + dump slot
    n = 30_000

    base_ids = jnp.asarray(rng.integers(0, C - 1, n).astype(np.int32))
    vals_i = jnp.asarray(rng.integers(0, 1 << 28, n).astype(np.int32))

    # ---- scatter-min variants ----
    def scatter_flat(lanes):
        def body(carry):
            acc, salt = carry
            ids = (base_ids + salt) % (C - 1)
            groups = [ids + k * C for k in range(lanes)]
            upd = [vals_i + salt + k for k in range(lanes)]
            t = (
                jnp.full(lanes * C, IMAX, dtype=jnp.int32)
                .at[jnp.concatenate(groups)]
                .min(jnp.concatenate(upd))
            )
            return acc + t[0], salt + 1

        return body

    def scatter_row(lanes):
        def body(carry):
            acc, salt = carry
            ids = (base_ids + salt) % (C - 1)
            upd = jnp.stack(
                [vals_i + salt + k for k in range(lanes)], axis=1
            )
            t = (
                jnp.full((C, lanes), IMAX, dtype=jnp.int32)
                .at[ids]
                .min(upd)
            )
            return acc + t[0, 0], salt + 1

        return body

    init = (jnp.int32(0), jnp.int32(0))
    ms1 = chained_ms(scatter_flat(1), init, label=f"scatter flat 1-lane  n={n}")
    ms4f = chained_ms(scatter_flat(4), init, label=f"scatter flat 4-lane  n={4*n}")
    ms4r = chained_ms(scatter_row(4), init, label=f"scatter row  [n,4]   n={n} idx")
    ms8r = chained_ms(scatter_row(8), init, label=f"scatter row  [n,8]   n={n} idx")
    ms32r = chained_ms(scatter_row(32), init, label=f"scatter row  [n,32]  n={n} idx")

    # ---- gather variants (argmin-carry shape: ncell lookups into [n] bufs) --
    ncell = C - 1
    qbase = jnp.asarray(rng.integers(0, n, ncell).astype(np.int32))
    buf2 = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    buf8 = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    flatbuf = jnp.asarray(rng.normal(size=2 * n).astype(np.float32))

    def gather_flat2(carry):
        acc, salt = carry
        q = (qbase + salt) % n
        g = flatbuf[jnp.concatenate([q, q + n])]
        return acc + g[0], salt + 1

    def gather_row(buf):
        def body(carry):
            acc, salt = carry
            q = (qbase + salt) % n
            g = buf[q]
            return acc + g[0, 0], salt + 1

        return body

    initf = (jnp.float32(0.0), jnp.int32(0))
    msg2f = chained_ms(gather_flat2, initf, label=f"gather flat 2x       n={2*ncell}")
    msg2r = chained_ms(gather_row(buf2), initf, label=f"gather row [n,2]     n={ncell} idx")
    msg8r = chained_ms(gather_row(buf8), initf, label=f"gather row [n,8]     n={ncell} idx")

    print("\nsummary (ns/serialized-unit if per-index):")
    for label, ms, idx in [
        ("flat1", ms1, n), ("flat4", ms4f, 4 * n), ("row4", ms4r, n),
        ("row8", ms8r, n), ("row32", ms32r, n),
        ("gflat2", msg2f, 2 * ncell), ("grow2", msg2r, ncell),
        ("grow8", msg8r, ncell),
    ]:
        print(f"  {label:<8s} {ms:8.4f} ms  {ms*1e6/idx:7.1f} ns/idx")


if __name__ == "__main__":
    main()
