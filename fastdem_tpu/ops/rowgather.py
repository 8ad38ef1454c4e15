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

import jax
import jax.numpy as jnp

_LANES = 128


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
