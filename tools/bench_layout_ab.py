#!/usr/bin/env python
"""Operand-layout A/B: the r4/r5 'per-process bimodality' mechanism probe.

r5 established (AOT_VS_JIT_r5.json + same-session probes): the p2 chain
measures ~0.80 ms/scan when the staged scans are CLOSED OVER by the jitted
chain (compile-time constants — the draws harness) and ~1.09 when they are
passed as ARGUMENTS (bench.py), byte-identical math, same session, same
compile API, cache state irrelevant. Hypothesis: XLA lays out baked
constants optimally but accepts default layouts for parameters; the fix —
if confirmed — is Layout.AUTO on the scan parameters + device_put into
the compiled layout before staging, which is a REAL production
optimization for the replay path, not benchmark cosmetics.

Three chains, one process, same data, K/2K two-length estimator each:
  arg      scans as parameters, default layouts   (bench.py shape)
  auto     scans as parameters, Layout.AUTO + pre-relayout device_put
  const    scans baked as constants               (draws shape)

Usage: python tools/bench_layout_ab.py [p2|kalman|rgbd] [--k 64]
"""

import argparse
import json
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
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--pairs", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import bench_compile_draws as bcd
    from fastdem_tpu.utils.benchtime import two_length_diff_ms

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    step, state, scans2k, masks2k, tx2k, K = bcd.build(args.config, args.k)
    T_bs = jnp.eye(4).at[2, 3].set(1.0)

    def body(s, inp):
        xyz, mask, txi = inp
        T_wb = jnp.eye(4).at[0, 3].set(txi)
        s, _ = step(s, xyz, mask, T_bs, T_wb)
        return s, ()

    def chain_args(s, scans, masks, tx):
        s, _ = jax.lax.scan(body, s, (scans, masks, tx))
        return s

    results = {}

    def measure(label, call_k, call_2k):
        jax.block_until_ready(call_k().layers)
        jax.block_until_ready(call_2k().layers)
        ms, per_pair, _ = two_length_diff_ms(
            lambda: jax.block_until_ready(call_k().layers),
            lambda: jax.block_until_ready(call_2k().layers),
            K, pairs=args.pairs,
        )
        print(f"{args.config} {label:>6s}: {ms:.3f} ms/scan "
              f"(pairs {min(per_pair):.3f}..{max(per_pair):.3f})",
              flush=True)
        results[label] = round(ms, 4)

    a_k = (state, scans2k[:K], masks2k[:K], tx2k[:K])
    a_2k = (state, scans2k, masks2k, tx2k)

    # --- arg: parameters with default layouts (bench.py's shape).
    t0 = time.time()
    jitted = jax.jit(chain_args)
    c_k = jitted.lower(*a_k).compile()
    c_2k = jitted.lower(*a_2k).compile()
    print(f"[arg] compile {time.time() - t0:.0f}s", file=sys.stderr)
    measure("arg", lambda: c_k(*a_k), lambda: c_2k(*a_2k))

    # --- auto: parameters with XLA-chosen layouts; operands re-laid
    # BEFORE timing so staging cost stays out of the chain numbers.
    try:
        from jax.experimental.layout import Format, Layout

        t0 = time.time()
        jitted_auto = jax.jit(chain_args, in_shardings=Format(Layout.AUTO))
        ca_k = jitted_auto.lower(*a_k).compile()
        ca_2k = jitted_auto.lower(*a_2k).compile()
        print(f"[auto] compile {time.time() - t0:.0f}s", file=sys.stderr)

        def relay(compiled, argtuple):
            fmts = compiled.input_formats[0]
            return tuple(
                jax.device_put(a, f) for a, f in zip(argtuple, fmts)
            )

        try:
            b_k = relay(ca_k, a_k)
            b_2k = relay(ca_2k, a_2k)
        except Exception as e:  # noqa: BLE001 — API drift fallback
            print(f"[auto] relayout unavailable ({e}); passing raw args",
                  file=sys.stderr)
            b_k, b_2k = a_k, a_2k
        measure("auto", lambda: ca_k(*b_k), lambda: ca_2k(*b_2k))
    except Exception as e:  # noqa: BLE001
        print(f"[auto] skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # --- const: scans baked into the program (the draws harness shape).
    t0 = time.time()

    def chain_const(n):
        def f(s):
            s, _ = jax.lax.scan(
                body, s, (scans2k[:n], masks2k[:n], tx2k[:n])
            )
            return s

        return jax.jit(f).lower(state).compile()

    cc_k = chain_const(K)
    cc_2k = chain_const(2 * K)
    print(f"[const] compile {time.time() - t0:.0f}s", file=sys.stderr)
    measure("const", lambda: cc_k(state), lambda: cc_2k(state))

    print("LAYOUTAB " + json.dumps(
        {"config": args.config, "k": K, **results}
    ))


if __name__ == "__main__":
    main()
