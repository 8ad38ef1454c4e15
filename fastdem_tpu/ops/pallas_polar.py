"""Pallas TPU kernel: the polar ray field's dense tail in VMEM.

``postprocess.raycasting.polar_smeared_field`` turns the scattered
min-slope table into the azimuth-smeared height field with ~30 dense
passes (reverse cummin, in-cell fold, per-column azimuth roll-mins,
exact-window residual folds). Under XLA each pass materializes the
[R, A] field through HBM (~0.14 ms at the headline [515, 2048] shape —
tools/bench_perop.py "dense"); this kernel keeps the field in VMEM and
performs every pass on-chip, writing HBM once.

Mosaic constraints honored (the remote compiler crashes on per-element
VMEM access, ops/pallas_resample.py): every operation here is a
full-array elementwise op or a STATIC slice/concat — no dynamic indexing.
The reverse cummin is realized as suffix-min doubling (min is exact and
idempotent, so overlapping windows are harmless and the result is
bit-identical to ``lax.cummin(reverse=True)``); circular azimuth rolls
are static two-slice concats; per-column masks compare an int32 [R, 1]
level/shift input against static constants.

Parity: all reductions are exact mins; the single affine evaluation
(h = z0 + slope * d) is subject to FMA contraction, so outputs agree
with the XLA formulation to f32-contraction tolerance (< 4e-6 on
heights; identical finite sets — tests/test_rowops.py
TestPallasPolarField, interpret mode). On the real chip both compilers
contracted identically and the comparison measured bit-exact (maxdiff
0.0; BENCH_NOTES.md round 2b), but only the tolerance is guaranteed.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.inf


def _roll_lanes(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Circular shift by -s along the lane axis (static two-slice concat)."""
    if s == 0:
        return x
    return jnp.concatenate([x[:, s:], x[:, :s]], axis=1)


def _kernel(scat_ref, lvl_ref, shift_ref, scal_ref, out_ref, *,
            nfold, max_lvl, max_shift_bits, exact_window):
    x = scat_ref[:]
    r8, a = x.shape

    # Reverse cummin (suffix min) via doubling; padded rows (>= r_true)
    # hold +inf, so shifting in +inf at the bottom edge is the identity.
    s = 1
    while s < r8:
        shifted = jnp.concatenate(
            [x[s:, :], jnp.full((s, a), _INF, dtype=x.dtype)], axis=0
        )
        x = jnp.minimum(x, shifted)
        s *= 2

    z0 = scal_ref[0, 0]
    dr = scal_ref[0, 1]
    d_r = jax.lax.broadcasted_iota(jnp.int32, (r8, 1), 0).astype(
        jnp.float32
    ) * dr
    h = jnp.where(jnp.isfinite(x), z0 + x * d_r, _INF)

    # In-cell fold: windowed min over the next nfold range bins
    # (raycasting.polar_smeared_field's _shift_down accumulation: doubling
    # then one residual pass; top edge replicates row 0).
    def shift_down(arr, k):
        if k == 0:
            return arr
        top = jnp.broadcast_to(arr[:1, :], (k, a))
        return jnp.concatenate([top, arr[:-k, :]], axis=0)

    p = 1
    acc = h
    while 2 * p <= nfold:
        acc = jnp.minimum(acc, shift_down(acc, p))
        p *= 2
    if nfold - p > 0:
        acc = jnp.minimum(acc, shift_down(acc, nfold - p))
    h = acc

    # Azimuth smears: per-column power-of-two roll-min doublings gated by
    # the static level table, then the exact-window residual bit folds.
    lvl = lvl_ref[:]
    for k in range(max_lvl):
        rowmask = lvl > k
        h = jnp.where(rowmask, jnp.minimum(h, _roll_lanes(h, 1 << k)), h)
    if exact_window:
        shift = shift_ref[:]
        for b in range(max_shift_bits):
            rowmask = ((shift >> b) & 1) == 1
            h = jnp.where(
                rowmask, jnp.minimum(h, _roll_lanes(h, 1 << b)), h
            )
    out_ref[:] = h


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_azimuth", "range_bin_factor", "max_range", "exact_window",
        "geom", "interpret",
    ),
)
def polar_smeared_field_pallas(
    geom,
    sensor_origin: jnp.ndarray,
    scat_flat: jnp.ndarray,
    num_azimuth: int = 2048,
    range_bin_factor: float = 0.5,
    max_range: Optional[float] = None,
    exact_window: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for raycasting.polar_smeared_field (bit-exact).

    Requires A to be a multiple of 128 (every preset uses 1024/2048).
    ``interpret=True`` runs the Mosaic interpreter (CPU tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fastdem_tpu.postprocess.raycasting import (
        _column_windows,
        polar_dims,
    )

    A, R, dr = polar_dims(geom, num_azimuth, range_bin_factor, max_range)
    if A % 128 != 0:
        raise ValueError(f"num_azimuth must be a multiple of 128, got {A}")
    lvl_np, shift_np = _column_windows(geom, A, R, dr)
    r8 = int(math.ceil(R / 8)) * 8
    nfold = max(1, int(math.ceil(1.0 / range_bin_factor)))
    max_lvl = int(np.max(lvl_np))
    max_shift = int(np.max(shift_np))
    max_shift_bits = max(0, max_shift).bit_length() if exact_window else 0

    scat = scat_flat.reshape(R, A)
    if r8 != R:
        scat = jnp.concatenate(
            [scat, jnp.full((r8 - R, A), _INF, dtype=scat.dtype)], axis=0
        )
    pad_i32 = np.zeros(r8 - R, dtype=np.int32)
    lvl = jnp.asarray(
        np.concatenate([lvl_np.astype(np.int32), pad_i32])
    ).reshape(r8, 1)
    shift = jnp.asarray(
        np.concatenate([shift_np.astype(np.int32), pad_i32])
    ).reshape(r8, 1)
    scal = jnp.stack(
        [sensor_origin[2], jnp.float32(dr)]
    ).reshape(1, 2)

    kernel = functools.partial(
        _kernel,
        nfold=nfold,
        max_lvl=max_lvl,
        max_shift_bits=max_shift_bits,
        exact_window=exact_window,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r8, A), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scat, lvl, shift, scal)
    return out[:R]
