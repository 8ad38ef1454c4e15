#!/usr/bin/env python
"""Launcher: preset selection + optional live viewer, one command.

Behavioral equivalent of the reference's launch file
(/root/reference/ros2/launch/run.launch.py:11-47), which picks the
local/global YAML preset via the ``global_mapping`` arg, forwards
``input_scan``, and conditionally starts RViz. Here:

  --global-mapping   selects global_mapping_node.yaml (else local_mapping)
  --input-scan DIR   scan source directory (else synthetic scans)
  --viz              starts the live browser viewer (the RViz condition;
                     tools/fastdem_node.py --live-port 0)

Everything else is forwarded to tools/fastdem_node.py verbatim.

Examples:
  python tools/run_launch.py --viz --synthetic 16 --platform cpu
  python tools/run_launch.py --global-mapping --input-scan /data/scans
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PRESETS = os.path.join(
    os.path.dirname(HERE), "fastdem_tpu", "config", "presets"
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__, add_help=True)
    ap.add_argument("--global-mapping", action="store_true",
                    help="use the global-mapping preset "
                         "(run.launch.py 'global_mapping' arg)")
    ap.add_argument("--input-scan", default=None,
                    help="scan directory ('input_scan' arg); default "
                         "synthetic")
    ap.add_argument("--viz", action="store_true",
                    help="start the live browser viewer ('rviz' arg)")
    ap.add_argument("--synthetic", type=int, default=16)
    args, passthrough = ap.parse_known_args(argv)

    preset = (
        "global_mapping_node.yaml" if args.global_mapping
        else "local_mapping.yaml"
    )
    cmd = [
        sys.executable, os.path.join(HERE, "fastdem_node.py"),
        "--config", os.path.join(PRESETS, preset),
    ]
    if args.input_scan:
        cmd += ["--scans", args.input_scan]
    else:
        cmd += ["--synthetic", str(args.synthetic)]
    if args.viz:
        cmd += ["--live-port", "0"]
    cmd += passthrough
    print("launch:", " ".join(cmd), file=sys.stderr)
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
