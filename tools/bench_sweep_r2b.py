#!/usr/bin/env python
"""Same-session A/B: LOCAL half-diagonal field bound (+ rows) vs the
round-1 full-diagonal field; plus the current headline number."""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fastdem_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench_sweep import run_variant  # noqa: E402


def main():
    print("device:", jax.devices()[0], flush=True)
    run_variant("rows + local field bound", scatter_mode="rows")
    run_variant("rows, full-diag field (r1)", scatter_mode="rows",
                ray_max_range=22.0)
    run_variant("p2 rows + bound", scatter_mode="rows",
                cfg_mut=lambda c: setattr(
                    c.mapping, "estimation_type",
                    __import__("fastdem_tpu.config.config",
                               fromlist=["EstimationType"]
                               ).EstimationType.P2_QUANTILE))


if __name__ == "__main__":
    main()
