#!/usr/bin/env python
"""Render the committed benchmark artifacts as a PNG figure.

Equivalent of the reference's benchmark-figure scripts
(lib/nanoPCL/scripts/plot_benchmark*.py): one chart from the committed
JSON artifacts instead of hand-maintained tables.

Panels:
  1. Speedup vs the reference baseline per measured config
     (BENCH_ALL_r*.json; reference ~10 ms/scan, BASELINE.md).
  2. Headline ms/scan across build rounds (BENCH_r0*.json).
  3. Library ops vs the reference's published i7 numbers
     (BENCH_OPS_r*.json, when present).

Usage: python tools/bench_plot.py [--out assets/bench.png]
"""

import argparse
import glob
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Palette: validated categorical slots on the light surface; text wears
# text tokens, marks carry identity (single series per panel -> no legend).
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
SERIES1 = "#2a78d6"
GRID = "#e5e4e0"

LABELS = {
    "local_kalman_lidar_raycast_15m": "Kalman + raycast (headline)",
    "p2_lidar_raycast_15m": "P2 quantile + raycast",
    "rgbd_300k_15m": "RGB-D 300K pts",
    "rgbd_300k_masked60_fullcap": "RGB-D 60% masked, full cap",
    "rgbd_300k_masked60_bucketed": "RGB-D 60% masked, bucketed",
    "global_200m_raycast": "GLOBAL 200 m + raycast",
    "kfused_offline_replay_15m": "K-fused replay (A/B)",
    "transform_500k": "transform 500K",
    "voxelgrid_500k": "voxelGrid 500K",
    "normals_100k": "normals 100K",
    "knn_100k": "kNN 100K",
    "icp_10k": "ICP 10K",
    "vgicp_50k": "VGICP 50K",
    "vgicp_100k": "VGICP 100K",
}


def style_axis(ax):
    ax.set_facecolor(SURFACE)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=TEXT2, labelsize=9)
    ax.xaxis.label.set_color(TEXT2)
    ax.yaxis.label.set_color(TEXT2)
    ax.title.set_color(TEXT)


def speedup_panel(ax, rows, title, ref_key="vs_baseline"):
    rows = [r for r in rows if r.get(ref_key)]
    if not rows:
        ax.set_visible(False)
        return
    names = [LABELS.get(r["config"], r["config"]) for r in rows][::-1]
    sp = [r[ref_key] for r in rows][::-1]
    y = range(len(rows))
    # Log axis when the spread spans decades (library ops run 0.01x to
    # 1000x): a linear axis collapses every bar but the winner.
    logscale = max(sp) / max(min(sp), 1e-9) > 50
    ax.barh(y, sp, height=0.55, color=SERIES1, zorder=3,
            left=min(sp) / 10 if logscale else 0)
    ax.axvline(1.0, color=TEXT2, linewidth=1, zorder=4)
    ax.set_yticks(list(y), names)
    for yi, v, r in zip(y, sp, rows[::-1]):
        off = v * 1.15 if logscale else v + max(sp) * 0.015
        ax.text(off, yi, f"{v:g}x ({r['ms']:g} ms)",
                va="center", ha="left", fontsize=8.5, color=TEXT)
    if logscale:
        ax.set_xscale("log")
        ax.set_xlim(min(sp) / 10, max(sp) * 40)
        ax.set_xlabel("speedup over reference (x, log scale; <1 = slower)",
                      fontsize=9)
    else:
        ax.set_xlim(0, max(sp) * 1.35)
        ax.set_xlabel("speedup over reference (x)", fontsize=9)
    ax.set_title(title, fontsize=11, loc="left")
    ax.xaxis.grid(True, color=GRID, linewidth=0.8, zorder=0)
    style_axis(ax)


def rounds_panel(ax):
    pts = []
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r0*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
            v = d.get("parsed", d).get("value")
            if v:
                pts.append((os.path.basename(p)[7:9].lstrip("0"), v))
        except Exception:  # noqa: BLE001
            continue
    if len(pts) < 2:
        ax.set_visible(False)
        return
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    ax.plot(xs, ys, color=SERIES1, linewidth=2, marker="o", markersize=6,
            zorder=3)
    for x, v in pts:
        ax.annotate(f"{v:.2f}", (x, v), textcoords="offset points",
                    xytext=(0, 8), ha="center", fontsize=8.5, color=TEXT)
    ax.axhline(1.0, color=TEXT2, linewidth=1, linestyle=":", zorder=2)
    ax.text(0.02, 1.02, "1.0 ms target", transform=ax.get_yaxis_transform(),
            fontsize=8, color=TEXT2, va="bottom")
    ax.set_ylim(0, max(ys) * 1.25)
    ax.set_xlabel("build round", fontsize=9)
    ax.set_ylabel("headline ms/scan", fontsize=9)
    ax.set_title("Headline per round (driver-recorded)", fontsize=11,
                 loc="left")
    ax.yaxis.grid(True, color=GRID, linewidth=0.8, zorder=0)
    style_axis(ax)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "assets",
                                                  "bench_summary.png"))
    ap.add_argument("--round", default=None,
                    help="artifact round suffix (default: latest found)")
    args = ap.parse_args()

    def latest(pattern):
        # [0-9]* digits only: partial artifacts (BENCH_ALL_r4_rest.json
        # etc.) must not shadow the merged per-round file.
        paths = sorted(glob.glob(os.path.join(REPO, pattern)))
        paths = [p for p in paths
                 if os.path.basename(p).split("_r")[-1][:-5].isdigit()]
        if args.round:
            paths = [p for p in paths if f"r{args.round}.json" in p]
        return paths[-1] if paths else None

    panels = []
    all_path = latest("BENCH_ALL_r*.json")
    if all_path:
        with open(all_path) as f:
            allj = json.load(f)
        panels.append(("all", allj))
    ops_path = latest("BENCH_OPS_r*.json")
    if ops_path:
        with open(ops_path) as f:
            opsj = json.load(f)
        panels.append(("ops", opsj))

    n = 1 + len(panels)
    fig, axes = plt.subplots(
        n, 1, figsize=(7.2, 2.6 + 2.4 * n), facecolor=SURFACE,
        gridspec_kw={"hspace": 0.75},
    )
    axes = [axes] if n == 1 else list(axes)

    i = 0
    for kind, data in panels:
        if kind == "all":
            speedup_panel(
                axes[i], data["configs"],
                f"Mapping pipeline vs reference ~10 ms/scan "
                f"({data.get('device', 'TPU')})",
            )
        else:
            speedup_panel(
                axes[i], data["configs"],
                "Library ops vs nanoPCL published (Intel i7 -O3)",
                ref_key="vs_ref",
            )
        i += 1
    rounds_panel(axes[i])

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=160, bbox_inches="tight",
                facecolor=SURFACE)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
