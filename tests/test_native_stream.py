"""Native prefetching scan stream (fastdem_tpu/native/src/scanstream.cpp).

The data-loader half of offline replay: a worker pool parses scan files
ahead of the consumer, in file order, pre-padded to a fixed capacity.
Covers native/pure-Python interface equivalence, ordering under
multithreaded parsing, padding/truncation, parse-failure frames, and the
fastdem_replay --prefetch CLI path.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from fastdem_tpu import native
from fastdem_tpu.cloud.pointcloud import from_numpy
from fastdem_tpu.io import pcd as pcd_io


def _write_scans(tmp_path, n_files, n_pts, rng, fmt="pcd"):
    paths = []
    truths = []
    for i in range(n_files):
        xyz = rng.uniform(-5, 5, (n_pts + i, 3)).astype(np.float32)
        inten = rng.uniform(0, 100, (n_pts + i,)).astype(np.float32)
        p = tmp_path / f"{i:06d}.{fmt}"
        if fmt == "pcd":
            assert pcd_io.save_pcd(str(p), from_numpy(xyz, intensity=inten))
        else:
            assert pcd_io.save_kitti_bin(
                str(p), from_numpy(xyz, intensity=inten)
            )
        paths.append(str(p))
        truths.append((xyz, inten))
    return paths, truths


@pytest.mark.parametrize("fmt", ["pcd", "bin"])
def test_stream_matches_direct_loads(tmp_path, rng, fmt):
    paths, truths = _write_scans(tmp_path, 6, 500, rng, fmt)
    cap = 1024
    with native.ScanStream(
        paths, cap, threads=3, ring=4, with_intensity=True
    ) as s:
        out = list(s)
    assert len(out) == 6
    for (xyz, mask, inten), (txyz, tinten) in zip(out, truths):
        n = len(txyz)
        assert xyz.shape == (cap, 3) and mask.shape == (cap,)
        assert mask[:n].all() and not mask[n:].any()
        np.testing.assert_array_equal(xyz[:n], txyz)
        np.testing.assert_array_equal(xyz[n:], 1e9)
        np.testing.assert_allclose(inten[:n], tinten, rtol=1e-6)


def test_stream_truncates_to_capacity(tmp_path, rng):
    paths, truths = _write_scans(tmp_path, 1, 300, rng)
    with native.ScanStream(paths, 100, threads=1) as s:
        xyz, mask, _ = next(s)
    assert mask.sum() == 100
    np.testing.assert_array_equal(xyz[:100], truths[0][0][:100])


def test_stream_parse_failure_yields_empty_frame(tmp_path, rng):
    paths, truths = _write_scans(tmp_path, 2, 200, rng)
    bad = tmp_path / "000001a.pcd"  # sorts between the two good files
    bad.write_text("not a pcd header\n")
    ordered = [paths[0], str(bad), paths[1]]
    with native.ScanStream(ordered, 512, threads=2) as s:
        frames = list(s)
    assert len(frames) == 3
    assert frames[0][1].sum() == 200
    assert frames[1][1].sum() == 0  # failed file -> empty frame
    assert frames[2][1].sum() == 201
    assert s.errors == 1


def test_stream_nonfinite_points_masked(tmp_path):
    xyz = np.array(
        [[0.0, 0.0, 1.0], [np.nan, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32
    )
    p = tmp_path / "nan.pcd"
    # save_pcd may reject NaN via from_numpy's masking; write ascii by hand.
    p.write_text(
        "VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        "WIDTH 3\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 3\nDATA ascii\n"
        "0 0 1\nnan 0 0\n1 1 1\n"
    )
    with native.ScanStream([str(p)], 8, threads=1) as s:
        got, mask, _ = next(s)
    assert mask.sum() == 2
    assert not mask[1]
    np.testing.assert_array_equal(got[1], 1e9)
    np.testing.assert_array_equal(got[0], xyz[0])


def test_python_fallback_equivalent(tmp_path, rng, monkeypatch):
    """Fallback == native for under-capacity, OVER-capacity (same
    truncation window: first cap points in file order), and non-finite
    points (masked in place, not compacted)."""
    paths, truths = _write_scans(tmp_path, 3, 128, rng)
    # Over-capacity file with a NaN point inside the truncation window.
    big = tmp_path / "zzbig.pcd"
    rows = ["0 0 1"] * 300
    rows[5] = "nan 0 0"
    big.write_text(
        "VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        "WIDTH 300\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 300\n"
        "DATA ascii\n" + "\n".join(rows) + "\n"
    )
    paths = paths + [str(big)]
    cap = 256
    with native.ScanStream(
        paths, cap, threads=2, with_intensity=True
    ) as s_native:
        out_native = list(s_native)
    monkeypatch.setattr(native, "_get", lambda: None)
    with native.ScanStream(
        paths, cap, threads=2, with_intensity=True
    ) as s_py:
        out_py = list(s_py)
    assert s_py._handle is None  # really took the fallback
    for (xa, ma, ia), (xb, mb, ib) in zip(out_native, out_py):
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_allclose(ia, ib, rtol=1e-6)
    assert out_native[-1][1].sum() == cap - 1  # NaN point masked, truncated


def test_replay_cli_resume_matches_single_run(tmp_path, rng):
    """Mapping 6 scans in one run == mapping 3, checkpointing to npz, and
    resuming the remaining 3 (--resume): the npz checkpoint carries the
    full estimator state losslessly (SURVEY 5.4)."""
    scans = tmp_path / "scans"
    scans.mkdir()
    paths, _ = _write_scans(scans, 6, 300, rng)
    T = np.eye(4)
    lines = []
    for i in range(6):
        T[0, 3] = 0.3 * i
        lines.append(" ".join(f"{v:.6f}" for v in T[:3].reshape(-1)))
    (tmp_path / "poses_all.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "poses_a.txt").write_text("\n".join(lines[:3]) + "\n")
    (tmp_path / "poses_b.txt").write_text("\n".join(lines[3:]) + "\n")
    half_b = tmp_path / "scans_b"
    half_b.mkdir()
    for p in paths[3:]:
        (half_b / os.path.basename(p)).write_bytes(open(p, "rb").read())
    half_a = tmp_path / "scans_a"
    half_a.mkdir()
    for p in paths[:3]:
        (half_a / os.path.basename(p)).write_bytes(open(p, "rb").read())

    def run(scan_dir, traj, out, resume=None):
        cmd = [
            sys.executable, "tools/fastdem_replay.py",
            "--config", "fastdem_tpu/config/presets/local_mapping.yaml",
            "--scans", str(scan_dir), "--trajectory", str(traj),
            "--capacity", "512", "--batch", "2",
            "--out", str(out), "--platform", "cpu",
        ]
        if resume:
            cmd += ["--resume", str(resume)]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr

    run(half_a, tmp_path / "poses_a.txt", tmp_path / "out_a")
    run(half_b, tmp_path / "poses_b.txt", tmp_path / "out_b",
        resume=tmp_path / "out_a" / "map.npz")
    run(scans, tmp_path / "poses_all.txt", tmp_path / "out_full")

    from fastdem_tpu.io.npz import load_npz

    _, s_resumed, _ = load_npz(str(tmp_path / "out_b" / "map.npz"))
    _, s_full, _ = load_npz(str(tmp_path / "out_full" / "map.npz"))
    assert set(s_resumed.layers) == set(s_full.layers)
    for name in s_full.layers:
        np.testing.assert_array_equal(
            np.asarray(s_resumed.layers[name]),
            np.asarray(s_full.layers[name]),
            err_msg=name,
        )

    # Resume must also survive the PREFETCH path's compile warm-up
    # (regression: the warm-up used identity poses, moving a resumed
    # LOCAL map back to the origin and wiping it).
    r = subprocess.run(
        [
            sys.executable, "tools/fastdem_replay.py",
            "--config", "fastdem_tpu/config/presets/local_mapping.yaml",
            "--scans", str(half_b), "--trajectory",
            str(tmp_path / "poses_b.txt"),
            "--prefetch", "2", "--capacity", "512", "--batch", "2",
            "--resume", str(tmp_path / "out_a" / "map.npz"),
            "--out", str(tmp_path / "out_b_pf"), "--platform", "cpu",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    _, s_pf, _ = load_npz(str(tmp_path / "out_b_pf" / "map.npz"))
    el_full = np.asarray(s_full.layers["elevation"])
    el_pf = np.asarray(s_pf.layers["elevation"])
    # Same measured support and heights (prefetch path re-pads clouds, so
    # require equality where both finite + matching NaN pattern).
    np.testing.assert_array_equal(np.isnan(el_full), np.isnan(el_pf))
    both = np.isfinite(el_full)
    np.testing.assert_array_equal(el_full[both], el_pf[both])


def test_replay_cli_prefetch(tmp_path, rng):
    scans = tmp_path / "scans"
    scans.mkdir()
    paths, _ = _write_scans(scans, 5, 400, rng)
    # KITTI trajectory: one 3x4 pose per scan, shifting +x.
    lines = []
    T = np.eye(4)
    for i in range(5):
        T[0, 3] = 0.5 * i
        lines.append(" ".join(f"{v:.6f}" for v in T[:3].reshape(-1)))
    traj = tmp_path / "poses.txt"
    traj.write_text("\n".join(lines) + "\n")

    out = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable, "tools/fastdem_replay.py",
            "--config", "fastdem_tpu/config/presets/local_mapping.yaml",
            "--scans", str(scans), "--trajectory", str(traj),
            "--prefetch", "2", "--capacity", "512", "--batch", "2",
            "--out", str(out), "--platform", "cpu",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "5 scans" in r.stderr
    assert (out / "map.npz").exists()
