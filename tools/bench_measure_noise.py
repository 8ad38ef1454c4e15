#!/usr/bin/env python
"""Measurement-noise probe for the two-length difference estimator.

bench_compile_draws.py (r3) showed: unsalted draws compile to IDENTICAL
executables (same sha256 fingerprint) and salted draws differ ONLY in the
salt constant — XLA:TPU compilation is deterministic for this pipeline.
Yet the measured ms/scan of the SAME binary moved 0.19 -> 0.57 -> 0.63
within one session. The "compile-draw variance" of BENCH_NOTES is
therefore measurement/session variance, not compile nondeterminism.

This tool compiles ONE program pair (K and 2K chains) and repeats the
paired two-length measurement M times, reporting the distribution of
  per-pair:   ms_i = (t2_i - t1_i) / K
  aggregates: pooled (sum t2 - sum t1), median-of-pairs, trimmed mean
so the estimator bench.py should use is chosen on data.

Usage: python tools/bench_measure_noise.py [kalman|p2|rgbd] [--k 64]
         [--pairs 12]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax

from tools.bench_compile_draws import build, make_runs, leaves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="p2",
                    choices=["kalman", "p2", "rgbd"])
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--pairs", type=int, default=12)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)
    step, state, scans, masks, tx, K = build(args.config, args.k)
    run1, run2 = make_runs(step, scans, masks, tx, K, None)

    t0 = time.time()
    jax.block_until_ready(leaves(run1(state)))
    jax.block_until_ready(leaves(run2(state)))
    print(f"compile+warm {time.time() - t0:.0f}s", flush=True)
    # Second warm-up pair: the first timed executions after compile ran
    # fast-then-slow in the draw probe.
    jax.block_until_ready(leaves(run1(state)))
    jax.block_until_ready(leaves(run2(state)))

    pairs = []
    for i in range(args.pairs):
        t0 = time.time()
        jax.block_until_ready(leaves(run1(state)))
        t1 = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(leaves(run2(state)))
        t2 = time.time() - t0
        ms = (t2 - t1) / K * 1e3
        pairs.append((t1, t2, ms))
        print(f"pair {i:2d}: t1={t1*1e3:8.1f} ms  t2={t2*1e3:8.1f} ms  "
              f"diff {ms:7.4f} ms/scan", flush=True)

    t1s = np.array([p[0] for p in pairs])
    t2s = np.array([p[1] for p in pairs])
    ds = np.array([p[2] for p in pairs])
    pooled = (t2s.sum() - t1s.sum()) / (len(pairs) * K) * 1e3
    med = float(np.median(ds))
    n_trim = max(1, len(ds) // 4)
    trimmed = float(np.mean(np.sort(ds)[n_trim:-n_trim]))
    print(
        f"SUMMARY {args.config} K={K} pairs={len(pairs)}: "
        f"per-pair min={ds.min():.4f} med={med:.4f} max={ds.max():.4f} "
        f"sd={ds.std():.4f} | pooled={pooled:.4f} trimmed={trimmed:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
