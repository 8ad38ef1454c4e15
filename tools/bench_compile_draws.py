#!/usr/bin/env python
"""Compile-draw variance probe (VERDICT r2 weak #2 / next-round #1).

bench --all observed up to ~70% device-time variance ACROSS COMPILES of
identical source (P2 0.77-1.34, RGB-D 2.45-4.6 ms/scan) while the Kalman
headline stayed stable. This tool takes N fresh compile draws of ONE
config in ONE session and measures each with the two-length difference
estimator, separating three hypotheses:

  a) compile nondeterminism given identical HLO  -> unsalted draws vary
  b) schedule sensitivity to the program HASH    -> unsalted draws agree,
     salted draws (one extra dummy scalar output per draw) vary
  c) session/chip variance, not compile          -> all draws agree
     in-session; only cross-session numbers vary

Draw 0 is RE-measured at the end as a session-drift control. Executable
fingerprints (hash of compiled.as_text(), when the PJRT backend exposes
it) are printed so identical-binary draws are identifiable; pass --dump
to save each draw's optimized HLO for diffing.

The persistent compile cache is intentionally NOT enabled (fresh draws
are the point).

Usage: python tools/bench_compile_draws.py [kalman|p2|rgbd] [--draws N]
         [--unsalted M] [--dump DIR]
"""

import argparse
import hashlib
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def build(config, K=None):
    from fastdem_tpu import Config, GridGeometry
    from fastdem_tpu.config.config import EstimationType, SensorType
    from fastdem_tpu.mapping.pipeline import build_integrate, create_map_state

    cfg = Config()
    cfg.raycasting.enabled = True
    K, N, spread = K or 64, 30000, 7.2
    if config == "p2":
        cfg.mapping.estimation_type = EstimationType.P2_QUANTILE
    elif config == "rgbd":
        cfg.raycasting.enabled = False
        cfg.sensor_model.type = SensorType.RGBD
        K, N, spread = min(K, 16), 300000, 6.0
    elif config != "kalman":
        raise SystemExit(f"unknown config {config}")

    geom = GridGeometry.from_length(15.0, 15.0, 0.1)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, (2 * K, N))
    rad = rng.uniform(0.5, spread, (2 * K, N))
    x = rad * np.cos(ang)
    y = rad * np.sin(ang)
    z = 0.2 * np.sin(0.8 * x) * np.cos(0.6 * y) - 1.0 + rng.normal(
        0, 0.02, (2 * K, N)
    )
    scans = jnp.asarray(np.stack([x, y, z], -1).astype(np.float32))
    masks = jnp.ones((2 * K, N), bool)
    tx = jnp.asarray(np.cumsum(rng.normal(0, 0.05, 2 * K)).astype(np.float32))
    state = create_map_state(geom, cfg)
    step = build_integrate(geom, cfg, jit=False)
    return step, state, scans, masks, tx, K


def make_runs(step, scans, masks, tx, K, salt):
    """Fresh jitted chain programs. salt=None -> byte-identical program
    text draw to draw; salt=i -> one extra dummy scalar output whose
    constant differs (logic untouched, but the HLO hash changes)."""
    T_bs = jnp.eye(4).at[2, 3].set(1.0)

    def body(s, inp):
        xyz, mask, txi = inp
        T_wb = jnp.eye(4).at[0, 3].set(txi)
        s, _ = step(s, xyz, mask, T_bs, T_wb)
        return s, ()

    def chain(s, n):
        s, _ = jax.lax.scan(body, s, (scans[:n], masks[:n], tx[:n]))
        if salt is None:
            return s
        return s, jnp.float32(salt)

    run1 = jax.jit(lambda s: chain(s, K))
    run2 = jax.jit(lambda s: chain(s, 2 * K))
    return run1, run2


def fingerprint(compiled, dump_path=None):
    try:
        txt = compiled.as_text()
        if dump_path:
            with open(dump_path, "w") as f:
                f.write(txt)
        return hashlib.sha256(txt.encode()).hexdigest()[:12], len(txt)
    except Exception as e:  # noqa: BLE001
        return f"unavailable({type(e).__name__})", 0


def leaves(out):
    return jax.tree_util.tree_leaves(out)


def measure(run1, run2, state, K, pairs=10):
    """Median-of-pairs two-length difference (same estimator as bench.py):
    the per-call dispatch jitter (~±10 ms) that single differences leak —
    the original source of the 'compile-draw variance' myth — is killed by
    taking the MEDIAN of each leg over ``pairs`` interleaved reps."""
    from fastdem_tpu.utils.benchtime import two_length_diff_ms

    t0 = time.time()
    jax.block_until_ready(leaves(run1(state)))
    jax.block_until_ready(leaves(run2(state)))
    warm_s = time.time() - t0
    ms, _, med_k = two_length_diff_ms(
        lambda: jax.block_until_ready(leaves(run1(state))),
        lambda: jax.block_until_ready(leaves(run2(state))),
        K, pairs=pairs,
    )
    return ms, med_k / K * 1e3, warm_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="p2",
                    choices=["kalman", "p2", "rgbd"])
    ap.add_argument("--draws", type=int, default=5,
                    help="salted draws (distinct program hashes)")
    ap.add_argument("--unsalted", type=int, default=3,
                    help="unsalted draws (byte-identical program)")
    ap.add_argument("--dump", default=None,
                    help="directory to save each draw's optimized HLO")
    ap.add_argument("--k", type=int, default=64,
                    help="chain length (run2 uses 2k); shorter compiles "
                         "much faster over the tunnel — draw COMPARISONS "
                         "only need a consistent k")
    args = ap.parse_args()

    if args.dump:
        import os

        os.makedirs(args.dump, exist_ok=True)

    print(f"device: {jax.devices()[0]}", flush=True)
    step, state, scans, masks, tx, K = build(args.config, args.k)

    results = []
    keep = {}  # draw label -> (run1, run2) kept alive for the drift control

    def compile_retry(run, tag):
        # The tunnel's remote_compile occasionally drops mid-response on
        # long compiles ("response body closed before all bytes were
        # read"); retry transient INTERNAL errors.
        for attempt in range(3):
            try:
                return run.lower(state).compile()
            except Exception as e:  # noqa: BLE001
                if attempt == 2:
                    raise
                print(f"  [{tag}] compile attempt {attempt} failed: "
                      f"{type(e).__name__}: {e}; retrying", flush=True)
                time.sleep(20)

    def one_draw(label, salt):
        run1, run2 = make_runs(step, scans, masks, tx, K, salt)
        t0 = time.time()
        c1 = compile_retry(run1, f"{label}/1x")
        c2 = compile_retry(run2, f"{label}/2x")
        compile_s = time.time() - t0
        dump = f"{args.dump}/{args.config}_{label}.hlo" if args.dump else None
        fp, txt_len = fingerprint(c2, dump)
        ms, raw, _ = measure(c1, c2, state, K)
        print(
            f"DRAW {args.config} {label:>10s}: {ms:7.4f} ms/scan "
            f"(raw {raw:7.4f}, compile {compile_s:5.0f}s, "
            f"fp {fp}, hlo {txt_len}B)",
            flush=True,
        )
        results.append((label, ms, fp))
        keep[label] = (c1, c2)

    for i in range(args.unsalted):
        one_draw(f"plain{i}", None)
    for i in range(args.draws):
        one_draw(f"salt{i}", i)

    # Session-drift control: re-measure the first draw's executables.
    first = results[0][0]
    run1, run2 = keep[first]
    ms, raw, _ = measure(run1, run2, state, K)
    print(f"CTRL {args.config} {first} re-measure: {ms:7.4f} ms/scan "
          f"(raw {raw:7.4f})", flush=True)

    import json

    vals = [m for _, m, _ in results]
    med = sorted(vals)[len(vals) // 2]
    summary = {
        "config": args.config,
        "k": K,
        "draws": [
            {"label": lab, "ms": round(m, 4), "fp": fp}
            for lab, m, fp in results
        ],
        "median_ms": round(med, 4),
        "min_ms": round(min(vals), 4),
        "max_ms": round(max(vals), 4),
        "spread_pct": round((max(vals) - min(vals)) / med * 100, 1),
        "ctrl_remeasure_ms": round(ms, 4),
        "distinct_fingerprints": len({fp for _, _, fp in results}),
    }
    print("DRAWSUMMARY " + json.dumps(summary), flush=True)

    vals = [ms for _, ms, _ in results]
    print(
        f"SUMMARY {args.config}: n={len(vals)} "
        f"min={min(vals):.4f} med={sorted(vals)[len(vals)//2]:.4f} "
        f"max={max(vals):.4f} spread={(max(vals)/min(vals)-1)*100:.1f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
