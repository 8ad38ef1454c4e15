#!/usr/bin/env python
"""Multi-host sharded global mapping worker (config 5 of BASELINE.md).

Run one instance per host (here: per process, each with a slice of
devices). The global map's [H, W] layers are block-sharded over the
combined mesh; every process feeds the same scan stream (scan input is
replicated — tiny next to the map) and process 0 writes the assembled npz.

Single-machine validation (2 processes x 4 virtual CPU devices):
  python tools/multihost_demo.py --pid 0 --nproc 2 --out /tmp/mh.npz &
  python tools/multihost_demo.py --pid 1 --nproc 2 &
On a real pod slice, drop --force-cpu and point --coordinator at host 0.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--coordinator", default="localhost:12377")
    ap.add_argument("--out", default=None)
    ap.add_argument("--scans", type=int, default=6)
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--map-size", type=float, default=40.0)
    ap.add_argument("--resolution", type=float, default=0.2)
    ap.add_argument("--force-cpu", type=int, default=1)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--batched", type=int, default=0,
                    help="integrate all scans in ONE device program "
                         "(sharded batched replay) instead of per-scan "
                         "dispatches")
    args = ap.parse_args()

    if args.force_cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        args.coordinator, num_processes=args.nproc, process_id=args.pid
    )
    print(
        f"[mh] proc {jax.process_index()}/{jax.process_count()} "
        f"local={jax.local_device_count()} global={jax.device_count()}",
        flush=True,
    )

    import jax.numpy as jnp
    import numpy as np

    from fastdem_tpu import Config, GridGeometry, MappingMode
    from fastdem_tpu.mapping.pipeline import create_map_state
    from fastdem_tpu.parallel import sharding as sh
    from fastdem_tpu.parallel.distributed import save_sharded_npz

    geom = GridGeometry.from_length(
        args.map_size, args.map_size, args.resolution
    )
    cfg = Config()
    cfg.mapping.mode = MappingMode.GLOBAL
    cfg.raycasting.enabled = True
    cfg.point_filter.range_max = args.map_size / 2

    mesh = sh.make_mesh()  # global mesh over all processes' devices

    rng = np.random.default_rng(0)  # identical stream on every process
    T_bs = jnp.eye(4).at[2, 3].set(1.0)
    K, n = args.scans, args.points
    scans = np.empty((K, n, 3), np.float32)
    for k in range(K):
        ang = rng.uniform(0, 2 * np.pi, n)
        rad = rng.uniform(0.5, args.map_size * 0.45, n)
        scans[k] = np.column_stack(
            [rad * np.cos(ang), rad * np.sin(ang), 0.2 * np.sin(rad) - 1.0]
        )

    if args.batched:
        seq, shard = sh.build_sharded_integrate_sequence(
            geom, cfg, mesh, donate=False
        )
        state = shard(create_map_state(geom, cfg))
        poses = jnp.broadcast_to(jnp.eye(4), (K, 4, 4))
        state = seq(
            state, jnp.asarray(scans), jnp.ones((K, n), bool), T_bs, poses
        )
    else:
        step, shard = sh.build_sharded_integrate(geom, cfg, mesh, donate=False)
        state = shard(create_map_state(geom, cfg))
        for k in range(K):
            state, _ = step(
                state, jnp.asarray(scans[k]), jnp.ones(n, bool), T_bs,
                jnp.eye(4),
            )
    jax.block_until_ready(state.layers)

    finite_local = sum(
        int(np.isfinite(np.asarray(sh_.data)).sum())
        for sh_ in state.layers["elevation"].addressable_shards
    )
    print(
        f"[mh] proc {args.pid}: finite cells (local shards) = {finite_local}",
        flush=True,
    )

    if args.out:
        # save_sharded_npz performs a cross-process allgather: EVERY
        # process must call it (pass the same --out to all ranks).
        ok = save_sharded_npz(args.out, geom, state)
        if jax.process_index() == 0:
            print(f"[mh] wrote {args.out}: {ok}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
