"""Tile-row gather: random element lookups via aligned 128-lane row
fetches plus a dense one-hot lane select.

XLA:TPU executes a random ELEMENT gather serially at ~13-19 ns per index
(growing with buffer size: 0.15 ms for 22.5K idx from a 120 KB buffer,
0.42 ms from a 4.2 MB buffer), but a gather of ALIGNED 128-lane tile rows
runs at ~3.8 ns/index with the lane select as dense VPU work — measured
0.027-0.086 ms for the same lookups (tools/bench_perop.py "rider"
variants, tools/bench_rowgather2.py; v5e via the remote backend). The
trick does NOT transfer to scatters (one-hot row scatter-min measured
even with the flat form — RMW serializes either way).

Exactness: values pass through an int32 bitcast; the one-hot select is a
sum against exact zeros, and under GSPMD a partitioned gather zero-fills
non-owned rows and sum-combines partials — int32 addition with 0 is exact
(f32 summation would flush denormal bit patterns such as packed colors;
same rationale as rasterize.rasterize_scatter_packed's fused gathers).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_LANES = 128

# A/B kill switch: plain element gathers instead. Read at TRACE time, so
# flipping it between builds compares both variants in one process
# (tools/bench_sweep_r2c.py); the env var sets the initial value.
_DISABLED = os.environ.get("FASTDEM_TILE_ROW_GATHER", "1") in ("0", "false")


def set_enabled(enabled: bool) -> None:
    global _DISABLED
    _DISABLED = not enabled


# Producer-sourced gathers (z, z_var, packed color — fusable elementwise
# producers, not materialized buffers): tile-row wins when the producer is
# small (30K pts: -0.21 ms on the Kalman config) but forces a full [n]
# materialization that loses when it is large (300K pts: +0.5 ms on
# RGB-D) — same-session A/Bs in tools/bench_sweep_r2c.py. Above this
# element count the flat gather is used so XLA fuses the producer and
# computes only the gathered elements.
_PRODUCER_MAX = int(os.environ.get("FASTDEM_TILE_ROW_PRODUCER_MAX", 65536))


def set_producer_threshold(max_elements: int) -> None:
    global _PRODUCER_MAX
    _PRODUCER_MAX = max_elements


def producer_gather(buf: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``buf[idx]`` for a buffer that is (typically) a fusable elementwise
    producer: tile-row below the size threshold, flat element gather (via
    an int32 bitcast — exact under GSPMD zero-fill+sum combining) above.
    """
    if _DISABLED or buf.shape[0] > _PRODUCER_MAX:
        g = jax.lax.bitcast_convert_type(buf, jnp.int32)[idx]
        return jax.lax.bitcast_convert_type(g, buf.dtype)
    return tile_row_gather(buf, idx)


def tile_row_gather(buf: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``buf[idx]`` for a flat 4-byte-dtype ``buf`` and int32 ``idx``.

    ``buf`` is padded to a multiple of 128 and reshaped to tile rows; the
    row containing each index is fetched (one serialized access per index,
    but a full aligned 512 B row) and the target lane selected densely.
    ``idx`` may have any shape; every index must be in ``[0, len(buf))``.
    """
    if buf.ndim != 1:
        raise ValueError(f"buf must be flat, got shape {buf.shape}")
    if buf.dtype.itemsize != 4:
        raise ValueError(f"4-byte dtypes only, got {buf.dtype}")
    if _DISABLED:
        return buf[idx]
    orig_dtype = buf.dtype
    m = buf.shape[0]
    bi = jax.lax.bitcast_convert_type(buf, jnp.int32)
    pad = (-m) % _LANES
    if pad:
        bi = jnp.concatenate([bi, jnp.zeros(pad, jnp.int32)])
    rows = bi.reshape(-1, _LANES)
    flat_idx = idx.reshape(-1)
    g = rows[flat_idx >> 7]  # [K, 128] aligned row gather
    lane = flat_idx & (_LANES - 1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, g.shape, 1) == lane[:, None]
    )
    v = jnp.sum(jnp.where(onehot, g, 0), axis=1)
    return jax.lax.bitcast_convert_type(v, orig_dtype).reshape(idx.shape)
