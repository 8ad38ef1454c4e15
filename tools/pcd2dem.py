#!/usr/bin/env python
"""pcd2dem: point cloud -> DEM -> point cloud CLI.

Equivalent of the reference tool (/root/reference/fastdem/tools/pcd2dem.cpp:23-58):
load a PCD (or KITTI .bin), run the batch DEM pipeline (SOR -> floating-point
removal -> rasterize -> inpaint), write the DEM back as a PCD of cell-center
points. Extras over the reference: --npz / --png artifact outputs.

Usage: pcd2dem.py <input.pcd|.bin> <output.pcd> [resolution] [--npz M.npz]
       [--png M.png] [--method max|min|mean|minmax]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("resolution", nargs="?", type=float, default=0.1)
    ap.add_argument("--method", default="max",
                    choices=["max", "min", "mean", "minmax"])
    ap.add_argument("--npz", default=None, help="also save the map as npz")
    ap.add_argument("--png", default=None, help="also save elevation as png")
    ap.add_argument("--sor-k", type=int, default=20)
    ap.add_argument("--sor-std", type=float, default=1.0)
    ap.add_argument("--height-threshold", type=float, default=2.0)
    ap.add_argument("--inpaint", type=int, default=3)
    ap.add_argument(
        "--platform", default=None,
        help="force a JAX platform (e.g. cpu); overrides the preloaded backend",
    )
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from fastdem_tpu.config.config import RasterMethod
    from fastdem_tpu.io import pcd as pcd_io
    from fastdem_tpu.mapping import batch

    try:
        if args.input.endswith(".bin"):
            cloud = pcd_io.load_kitti_bin(args.input)
        else:
            cloud = pcd_io.load_pcd(args.input)
    except (OSError, ValueError) as e:
        print(f"error: cannot read '{args.input}': {e}", file=sys.stderr)
        return 2
    n_in = cloud.count()
    print(f"loaded {n_in} points from {args.input}")
    if n_in == 0:
        print(f"error: '{args.input}' contains no points", file=sys.stderr)
        return 2

    cfg = batch.DEMConfig(
        resolution=args.resolution,
        method=RasterMethod(args.method),
        sor_k=args.sor_k,
        sor_std_mul=args.sor_std,
        height_threshold=args.height_threshold,
        inpaint_iterations=args.inpaint,
    )
    geom, state = batch.build_dem(cloud, cfg)
    print(
        f"DEM: {geom.rows}x{geom.cols} cells @ {geom.resolution} m "
        f"({geom.length[0]:.1f} x {geom.length[1]:.1f} m)"
    )

    out_cloud = batch.to_pointcloud(geom, state)
    if not pcd_io.save_pcd(args.output, out_cloud):
        print(f"ERROR: cannot write {args.output}", file=sys.stderr)
        return 1
    print(f"wrote {out_cloud.count()} DEM points -> {args.output}")

    if args.npz:
        from fastdem_tpu.io.npz import save_npz

        save_npz(args.npz, geom, state)
        print(f"wrote map -> {args.npz}")
    if args.png:
        from fastdem_tpu.io.png import save_png

        save_png(args.png, state, "elevation")
        print(f"wrote elevation image -> {args.png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
