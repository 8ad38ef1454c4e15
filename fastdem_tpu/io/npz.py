"""Lossless map checkpointing as reference-compatible .npz archives.

Same on-disk schema as the reference's hand-rolled writer
(/root/reference/fastdem/src/io_npz.cpp:377-436): an uncompressed zip of
one Fortran-order float32 ``<layer>.npy`` per layer plus ``meta.npy``, a
``|S`` scalar holding JSON metadata
{version, resolution, position, frame_id, size, start_index}
(io_npz.cpp:221-235). Files written by either implementation load in the
other (and in plain ``numpy.load``).

Because every internal estimator layer round-trips (P2 markers, Kalman P,
Welford M2), save/load is a complete checkpoint/resume of a mapping session
(SURVEY.md sec. 5.4). Our layout is always world-aligned, so we write
start_index [0, 0]; on load a nonzero start_index from a reference-produced
file is unrolled into world alignment (the inverse of the circular-buffer
rotation, io_png.cpp:142-144 convention).
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.grid.gridmap import GridMapState

METADATA_VERSION = 1  # io_npz.cpp:219


def zip_member_info(name: str):
    """Deterministic STORE-mode member header (fixed mtime): byte-identical
    output for identical maps, shared by save_npz and the streaming
    sharded writer (parallel/distributed.save_sharded_npz)."""
    import zipfile

    zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
    zi.compress_type = zipfile.ZIP_STORED
    zi.external_attr = 0o600 << 16
    return zi


def save_npz(
    path: str,
    geom: GridGeometry,
    state: GridMapState,
    layer_names: Optional[Iterable[str]] = None,
    frame_id: str = "map",
) -> bool:
    # Sorted member order: canonical, writer-independent bytes (the
    # streaming sharded writer must match byte-for-byte).
    names = sorted(layer_names) if layer_names is not None else sorted(state.layers)
    pos = np.asarray(state.position, dtype=np.float64)
    meta = {
        "version": METADATA_VERSION,
        "resolution": geom.resolution,
        "position": [float(pos[0]), float(pos[1])],
        "frame_id": frame_id,
        "size": [geom.rows, geom.cols],
        "start_index": [0, 0],
    }
    arrays: Dict[str, np.ndarray] = {}
    for name in names:
        if name not in state.layers:
            import logging

            logging.getLogger("fastdem_tpu.io").warning(
                "[npz_io] Layer '%s' does not exist, skipping", name
            )
            continue
        arrays[name] = np.asfortranarray(
            np.asarray(state.layers[name], dtype=np.float32)
        )
    meta_bytes = np.bytes_(json.dumps(meta).encode())
    try:
        # STORE-mode zip of .npy members, like the reference's hand-rolled
        # writer (src/io_npz.cpp:377-436). Members are materialized first
        # and written via writestr so the LOCAL headers carry real 32-bit
        # sizes: numpy's savez streams members with force_zip64 (size
        # fields = 0xFFFFFFFF + ZIP64 extra), which numpy.load accepts but
        # the reference's minimal ZIP parser rejects
        # (tests/test_reference_goldens.py pins this interop).
        import io as _io
        import zipfile

        with zipfile.ZipFile(
            path, "w", zipfile.ZIP_STORED, allowZip64=False
        ) as zf:
            for name, arr in {**arrays, "meta": np.array(meta_bytes)}.items():
                buf = _io.BytesIO()
                np.lib.format.write_array(
                    buf, np.asanyarray(arr), allow_pickle=False
                )
                zf.writestr(zip_member_info(name + ".npy"), buf.getvalue())
    except (OSError, zipfile.LargeZipFile):
        # LargeZipFile: a >=4 GiB member would need ZIP64, which the
        # reference's parser cannot read — fail soft like other IO errors.
        return False
    return True


def load_npz(path: str) -> Tuple[GridGeometry, GridMapState, Dict]:
    """Returns (geom, state, metadata dict). Raises ValueError on schema
    violations (mirroring the reference's validated load,
    io_npz.cpp:440-614 incl. the future-version gate :534-540)."""
    with np.load(path, allow_pickle=False) as data:
        if "meta" not in data:
            raise ValueError(f"{path}: missing meta.npy")
        meta_raw = data["meta"]
        meta = json.loads(bytes(meta_raw.item() if meta_raw.shape == () else meta_raw.tobytes()).decode())
        version = int(meta.get("version", -1))
        if version > METADATA_VERSION:
            raise ValueError(
                f"{path}: unsupported metadata version {version} "
                f"(supported <= {METADATA_VERSION})"
            )
        rows, cols = (int(v) for v in meta["size"])
        start = tuple(int(v) for v in meta.get("start_index", (0, 0)))
        geom = GridGeometry(
            rows=rows, cols=cols, resolution=float(meta["resolution"])
        )
        layers: Dict[str, jnp.ndarray] = {}
        for name in data.files:
            if name == "meta":
                continue
            arr = np.asarray(data[name], dtype=np.float32)
            if arr.shape != (rows, cols):
                raise ValueError(
                    f"{path}: layer '{name}' shape {arr.shape} != map size "
                    f"({rows}, {cols})"
                )
            if start != (0, 0):
                # Unroll the reference's circular buffer to world-aligned.
                arr = np.roll(arr, shift=(-start[0], -start[1]), axis=(0, 1))
            layers[name] = jnp.asarray(arr)
    state = GridMapState(
        layers=layers,
        position=jnp.asarray(meta["position"], dtype=jnp.float32),
    )
    return geom, state, meta
