#!/usr/bin/env python
"""A/B: jit-dispatch-compiled vs AOT-compiled execution of one program.

Round-4 finding (BENCH_NOTES "per-PROCESS bimodality"): byte-identical
StableHLO for the p2/rgbd chains measured ~40-70% apart depending on
which harness ran them — bench.py (jit dispatch) landed slow, the
compile-draws harness (``run.lower().compile()``) landed fast, kalman
the other way around. This tool measures BOTH paths for the same program
in ONE process: if the remote backend compiles the two requests to
different (deterministic) schedules, the split reproduces here; if the
numbers agree, the mechanism is elsewhere (process/runtime state).

Usage: python tools/bench_aot_vs_jit.py [p2|rgbd|kalman] [--k 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="p2",
                    choices=["kalman", "p2", "rgbd"])
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--pairs", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench_compile_draws as bcd

    step, state, scans2k, masks2k, tx2k, K = bcd.build(args.config, args.k)
    T_bs = jnp.eye(4).at[2, 3].set(1.0)

    def body(s, inp):
        xyz, mask, txi = inp
        T_wb = jnp.eye(4).at[0, 3].set(txi)
        s, _ = step(s, xyz, mask, T_bs, T_wb)
        return s, ()

    @jax.jit
    def run(state, scans, masks, tx):
        s, _ = jax.lax.scan(body, state, (scans, masks, tx))
        return s

    a1 = (state, scans2k[:K], masks2k[:K], tx2k[:K])
    a2 = (state, scans2k, masks2k, tx2k)

    t0 = time.time()
    aot1 = run.lower(*a1).compile()
    aot2 = run.lower(*a2).compile()
    print(f"AOT compile {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    jax.block_until_ready(run(*a1).layers)
    jax.block_until_ready(run(*a2).layers)
    print(f"JIT compile/warm {time.time() - t0:.1f} s", flush=True)

    def measure(f1, f2, label):
        t1s, t2s = [], []
        for _ in range(args.pairs):
            t0 = time.time()
            jax.block_until_ready(f1(*a1).layers)
            t1s.append(time.time() - t0)
            t0 = time.time()
            jax.block_until_ready(f2(*a2).layers)
            t2s.append(time.time() - t0)
        ms = max((np.median(t2s) - np.median(t1s)) / K * 1e3, 1e-4)
        print(f"{args.config} {label}: {ms:.3f} ms/scan "
              f"(raw {np.median(t1s) / K * 1e3:.3f})", flush=True)

    measure(run, run, "JIT-dispatch")
    measure(lambda *a: aot1(*a), lambda *a: aot2(*a), "AOT-executable")
    measure(run, run, "JIT-dispatch again")


if __name__ == "__main__":
    main()
