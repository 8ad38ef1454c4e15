#!/usr/bin/env python
"""Probe: phase-A microbatching — flatten K scans' irregular ops into
single flat offset-index ops.

Round-2 cost model (tools/bench_rowops*.py): scatter/gather serialize per
INDEX, and the per-index rate IMPROVES with index count (11.2 ns/idx at
30K -> 8.0 at 120K), while giant tables get table-size-bound (an [895K,34]
row table measured 16x worse). Phase A of the pipeline (rasterize scatter,
polar scatter, argmin/rider gathers) is per-scan independent given the
pose stream, so K consecutive scans' irregular ops can be ONE flat op each
with indices offset by k*stride — IF the K-fold larger tables don't hit
the table-size wall first. This probe measures that trade at the real
headline shapes (150x150 map, 30K pts, A=2048 R=426 polar field).

Run on the real chip: python tools/bench_microbatch.py [KMB ...]
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

C = 22501        # 150x150 cells + dump slot
N = 30_000       # points/scan
NCELL = 22500
L = 36           # row-table lanes (4 + 32 presence bitmap)
RA = 515 * 2048  # polar field entries (headline: dr=res/4, local bound)
S = RA + 1       # + dump slot


def chained_ms(body, init, iters, reps=3, label=""):
    """Two-length difference estimator: T(L) = D + L*m per call, with D the
    host->tunnel dispatch round trip (~10-40 ms, session-variable). Timing
    the SAME body chained at L and 2L and differencing cancels D exactly —
    comparisons across different iteration counts (e.g. 64/kmb) are
    otherwise biased by D/L."""

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
    out = run1(init)
    jax.block_until_ready(out)
    out = run2(init)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t1 = 0.0
    t2 = 0.0
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
    raw = t1 / (reps * iters) * 1e3
    print(
        f"{label:<46s} {ms:8.4f} ms/iter  (raw@L {raw:8.4f}, "
        f"compile {compile_s:5.1f}s)",
        flush=True,
    )
    return ms


def make_phase_a(kmb: int):
    """One iteration = kmb scans' irregular ops, flattened."""
    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(
        rng.integers(0, NCELL, (kmb, N)).astype(np.int32)
    )
    pids0 = jnp.asarray(rng.integers(0, RA, (kmb, N)).astype(np.int32))
    upd0 = jnp.asarray(
        rng.integers(1, 1 << 30, (kmb, N, L)).astype(np.int32)
    )
    vals0 = jnp.asarray(rng.random((kmb, N)).astype(np.float32))
    zvar0 = jnp.asarray(rng.random((kmb, N)).astype(np.float32))
    koff_c = (jnp.arange(kmb, dtype=jnp.int32) * C)[:, None]
    koff_s = (jnp.arange(kmb, dtype=jnp.int32) * S)[:, None]
    koff_n = (jnp.arange(kmb, dtype=jnp.int32) * N)[:, None]
    koff_ra = (jnp.arange(kmb, dtype=jnp.int32) * RA)[:, None]
    cell_iota = jnp.broadcast_to(
        jnp.arange(NCELL, dtype=jnp.int32)[None, :], (kmb, NCELL)
    )

    def body(carry):
        salt = carry.astype(jnp.int32)
        # Data-dependent indices (loop-invariant ones get hoisted/special-
        # cased by XLA and measure 100x fast — BENCH_NOTES.md).
        ids = (ids0 + salt) % NCELL
        pids = (pids0 + salt) % RA

        # 1. Row scatter: ONE flat op over [kmb*C, L].
        t = (
            jnp.full((kmb * C, L), IMAX, dtype=jnp.int32)
            .at[(ids + koff_c).reshape(-1)]
            .min(upd0.reshape(-1, L))
        )
        # 2. Polar flat scatter over [kmb*S].
        pt = (
            jnp.full(kmb * S, jnp.inf, dtype=jnp.float32)
            .at[(pids + koff_s).reshape(-1)]
            .min((vals0 + salt.astype(jnp.float32)).reshape(-1))
        )
        # 3. Argmin (var) gather: kmb*NCELL idx from the kmb*N buffer.
        amin = t.reshape(kmb, C, L)[:, :NCELL, 0] % N
        var_g = zvar0.reshape(-1)[(amin + koff_n).reshape(-1)]
        # 4. Rider field gather: kmb*NCELL idx from the kmb*RA field.
        ridx = (cell_iota * 37 + salt) % RA
        field_g = pt[: kmb * RA][(ridx + koff_ra).reshape(-1)]

        dep = (
            var_g.sum()
            + field_g.sum()
            + t[:, 1].astype(jnp.float32).sum() * 1e-18
        )
        return carry + dep * 1e-20 + 1.0

    return body


def main():
    print("device:", jax.devices()[0], flush=True)
    kmbs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    for kmb in kmbs:
        iters = max(1, 64 // kmb)
        body = make_phase_a(kmb)
        ms = chained_ms(
            body,
            jnp.float32(0.0),
            iters,
            label=f"phase-A irregular ops, microbatch K={kmb}",
        )
        print(f"    -> {ms / kmb:8.4f} ms/scan", flush=True)


if __name__ == "__main__":
    main()
