#!/usr/bin/env python
"""Microbenchmarks of primitive ops, measured honestly on the axon tunnel.

The axon PJRT relay appears to complete block_until_ready before device
work drains, so per-call wall timing lies. All measurements here chain K
dependent iterations of the op inside ONE jitted lax.scan (each iteration
consumes the previous result), then divide total wall time by K. Compile
time excluded by a warmup call.

TWO KNOWN TRAPS (BENCH_NOTES.md "Dispatch correction"):
1. Use K >= 64 — the per-call dispatch round trip (~10-40 ms) divided by
   a small K masquerades as per-op cost (the numbers below at K=32 carry
   a few tenths of a ms of it).
2. Irregular-op INDICES must be data-dependent across iterations: a
   scatter/gather whose indices are loop-invariant measures ~100x faster
   than the same op in the real pipeline (XLA hoists/specializes).
   Prefer full-pipeline same-session A/Bs for decisions.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K = 20  # chained iterations


def chained_ms(make_body, init, xs=None, reps=3):
    """Time K chained iterations of body inside one jit; return ms/iter."""

    @jax.jit
    def run(init):
        def body(carry, _):
            return make_body(carry), ()

        out, _ = jax.lax.scan(body, init, None, length=K)
        return out

    out = run(init)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = run(init)
    jax.block_until_ready(out)
    return (time.time() - t0) / (reps * K) * 1e3


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    C = 22500  # 150x150 cells

    # Calibration: known-cost elementwise op on a large buffer.
    big = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))  # 64MB
    ms = chained_ms(lambda x: x * 1.000001 + 0.5, big)
    bw = 2 * big.size * 4 / (ms * 1e-3) / 1e9
    print(f"calibration: 64MB elementwise {ms:7.3f} ms/iter (~{bw:.0f} GB/s)")

    for n in (30_000, 300_000, 3_000_000):
        ids = jnp.asarray(rng.integers(0, C, n).astype(np.int32))
        vals = jnp.asarray(rng.normal(size=n).astype(np.float32))

        def body(carry):
            acc, salt = carry
            out = jnp.full(C + 1, jnp.inf).at[ids].min(vals + salt)
            return (acc + out[:C].sum(), salt + 1.0)

        ms = chained_ms(body, (jnp.float32(0.0), jnp.float32(0.0)))
        print(f"scatter_min n={n:>9}: {ms:8.3f} ms/iter "
              f"({n/(ms*1e-3)/1e6:8.0f} Mupd/s)")

        def body_add(carry):
            acc, salt = carry
            out = jnp.zeros(C + 1).at[ids].add(vals + salt)
            return (acc + out[:C].sum(), salt + 1.0)

        ms = chained_ms(body_add, (jnp.float32(0.0), jnp.float32(0.0)))
        print(f"scatter_add n={n:>9}: {ms:8.3f} ms/iter "
              f"({n/(ms*1e-3)/1e6:8.0f} Mupd/s)")

    n = 30_000
    keysrc = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def body_sort(carry):
        acc, salt = carry
        ks, vs = jax.lax.sort((keysrc + salt, vals), num_keys=1)
        return (acc + vs[0], salt + 1)

    ms = chained_ms(body_sort, (jnp.float32(0.0), jnp.int32(0)))
    print(f"sort 30K 1-key:       {ms:8.3f} ms/iter")

    k2 = jnp.asarray(rng.integers(0, 1024, n).astype(np.int32))
    k3 = jnp.asarray(rng.integers(0, 1024, n).astype(np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)

    def body_sort4(carry):
        acc, salt = carry
        a, b, c, o = jax.lax.sort((k2 + salt, k3, keysrc, idx), num_keys=4)
        return (acc + o[0], salt + 1)

    ms = chained_ms(body_sort4, (jnp.int32(0), jnp.int32(0)))
    print(f"sort 30K 4-key+idx:   {ms:8.3f} ms/iter")

    seg = jnp.sort(jnp.asarray(rng.integers(0, C, n).astype(np.int32)))

    def body_seg(carry):
        acc, salt = carry
        out = jax.ops.segment_min(
            vals + salt, seg, num_segments=C, indices_are_sorted=True
        )
        return (acc + out.sum(), salt + 1.0)

    ms = chained_ms(body_seg, (jnp.float32(0.0), jnp.float32(0.0)))
    print(f"segment_min sorted:   {ms:8.3f} ms/iter")

    g = jnp.asarray(rng.normal(size=(152, 152)).astype(np.float32))

    def body_stencil(g):
        from fastdem_tpu.postprocess.stencil import square_offsets, window_stack

        win = window_stack(g, square_offsets(3))
        return jnp.sort(win, axis=0)[4]

    ms = chained_ms(body_stencil, g)
    print(f"3x3 window median 150x150: {ms:8.3f} ms/iter")

    # Segmented suffix-min via associative_scan (scatter-free rasterize core)
    n = 30_000
    ids_s = jnp.sort(jnp.asarray(rng.integers(0, C, n).astype(np.int32)))
    vals2 = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def body_seg_scan(carry):
        acc, salt = carry

        def comb(a, b):
            av, aid = a
            bv, bid = b
            v = jnp.where(aid == bid, jnp.minimum(av, bv), bv)
            return (v, bid)

        out, _ = jax.lax.associative_scan(comb, (vals2 + salt, ids_s))
        return (acc + out[-1], salt + 1.0)

    ms = chained_ms(body_seg_scan, (jnp.float32(0.0), jnp.float32(0.0)))
    print(f"assoc_scan segmin 30K: {ms:8.3f} ms/iter")

    queries = jnp.arange(C, dtype=jnp.int32)

    def body_ss(carry):
        acc, salt = carry
        pos = jnp.searchsorted(ids_s, queries + salt)
        return (acc + pos[0], salt + 0)

    ms = chained_ms(body_ss, (jnp.int32(0), jnp.int32(0)))
    print(f"searchsorted 22.5K into 30K: {ms:8.3f} ms/iter")

    # Gather 22.5K
    def body_gather(carry):
        acc, salt = carry
        g = vals2[jnp.clip(queries + salt, 0, n - 1)]
        return (acc + g.sum(), salt + 1)

    ms = chained_ms(body_gather, (jnp.float32(0.0), jnp.int32(0)))
    print(f"gather 22.5K: {ms:8.3f} ms/iter")



if __name__ == "__main__":
    main()
