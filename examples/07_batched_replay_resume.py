#!/usr/bin/env python
"""Batched offline replay with mid-run checkpoint/resume.

Beyond the reference's workflow (play a rosbag into the node, one
callback per scan): scans are staged in HBM and integrated K frames per
device program (FastDEM.integrate_sequence), the session checkpoints to
a reference-compatible .npz halfway, and a FRESH mapper resumes from it
— the final map matches an uninterrupted run bit-for-bit (the npz
carries the full estimator state, SURVEY.md 5.4).

Run: python examples/07_batched_replay_resume.py [--platform cpu]
"""
import os
import sys
import tempfile

import numpy as np

from common import Timer, ascii_render, force_platform, generate_terrain_cloud

force_platform("cpu" if "--platform" in sys.argv and "cpu" in sys.argv else None)

import fastdem_tpu as fd
from fastdem_tpu.grid.gridmap import GridMapState, layers
from fastdem_tpu.io.npz import load_npz, save_npz


def make_stream(K=12, n=20000):
    clouds, poses = [], []
    for k in range(K):
        clouds.append(generate_terrain_cloud(n, seed=100 + k))
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.25 * k
        poses.append(T)
    return clouds, np.stack(poses)


def main():
    geom = fd.GridGeometry.from_length(12.0, 12.0, 0.1)
    T_bs = np.eye(4, dtype=np.float32)
    clouds, poses = make_stream()
    K = len(clouds)

    # --- One uninterrupted batched replay -------------------------------
    m_full = fd.FastDEM(geom, fd.Config())
    with Timer(f"replay {K} scans batched (incl. compile)"):
        assert m_full.integrate_sequence(clouds, T_bs, poses, batch=4) == K

    # --- Same stream, split by a checkpoint/resume ----------------------
    half = K // 2
    m_a = fd.FastDEM(geom, fd.Config())
    m_a.integrate_sequence(clouds[:half], T_bs, poses[:half], batch=4)
    fd_ckpt, ckpt = tempfile.mkstemp(suffix=".npz")
    os.close(fd_ckpt)
    assert save_npz(ckpt, geom, m_a.state)
    print(f"checkpointed {half} scans -> {ckpt}")

    m_b = fd.FastDEM(geom, fd.Config())  # fresh process stand-in
    _, m_b.state, meta = load_npz(ckpt)
    os.unlink(ckpt)
    m_b.integrate_sequence(clouds[half:], T_bs, poses[half:], batch=4)

    for name in m_full.state.layers:
        a = np.asarray(m_full.state.layers[name])
        b = np.asarray(m_b.state.layers[name])
        assert (np.isnan(a) == np.isnan(b)).all(), name
        fin = np.isfinite(a)
        assert (a[fin] == b[fin]).all(), name
    print("resume == uninterrupted: bit-exact on all",
          len(m_full.state.layers), "layers")

    elev = np.asarray(m_full.state.layers[layers.elevation])
    print(ascii_render(elev))


if __name__ == "__main__":
    main()
