#!/usr/bin/env python
"""Round-2 same-session A/B: row-widened scatter vs round-1 packed/sort.

Decisions this feeds (VERDICT r1 #1/#5): rows as the default scatter mode,
and the never-measured sort-based rasterize at RGB-D scale (300K pts).
"""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fastdem_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench_sweep import run_variant  # noqa: E402  (tools/ sibling)


def main():
    print("device:", jax.devices()[0], flush=True)

    run_variant("raycast rows (new default)", scatter_mode="rows")
    run_variant("raycast packed (r1)", scatter_mode="packed")
    run_variant("no-raycast rows", raycast=False, scatter_mode="rows")
    run_variant("no-raycast packed", raycast=False, scatter_mode="packed")
    run_variant("300K rows", N=300000, raycast=False, scatter_mode="rows")
    run_variant("300K packed", N=300000, raycast=False, scatter_mode="packed")
    run_variant("300K sort", N=300000, raycast=False, scatter_mode="sort")
    run_variant("30K sort no-raycast", raycast=False, scatter_mode="sort")


if __name__ == "__main__":
    main()
