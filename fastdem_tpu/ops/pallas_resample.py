"""Pallas TPU kernel: polar-to-cartesian resample (two-gather window min).

The raycaster's final step reads, for every grid cell, two entries of the
azimuth-smeared polar field and takes their min
(postprocess/raycasting.py). XLA lowers those gathers to serialized HBM
accesses (~28 ns/element); this kernel keeps the whole polar field in VMEM
(~3.5 MB at A=2048, R<=512) and performs the per-cell reads as VMEM scalar
loads inside a fori_loop — the same serialization but at on-chip latency.

STATUS (round 1): EXPERIMENTAL, not wired into the pipeline. The axon
remote Mosaic compiler (v5e) crashes on every per-element VMEM access
pattern probed (scalar loads from VMEM refs, (1,)/(1,1) dynamic-slice
loads/stores) — only full-row dynamic slices with SMEM indices compile
(`o[pl.ds(i,1),:] = x[pl.ds(r,1),:]`). A row-gather + one-hot lane-extract
formulation compiles in principle but projects only ~2x over XLA's 0.92 ms
gather; revisit when per-element access lands or with that formulation.
The kernel below is correct under interpret mode (tests) and documents the
intended design.

SUPERSEDED (round 2): the resample gather is now served by the tile-row
gather (ops/rowgather.py, ~3.8 ns/idx — faster than this kernel's
projection), and the dense field passes by the VMEM-resident Pallas
kernel ops/pallas_polar.py. Kept as the record of the Mosaic per-element
VMEM findings.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _resample_kernel(field_ref, a0_ref, a1_ref, r_ref, out_ref):
    """out[i] = min(field[a0[i], r[i]], field[a1[i], r[i]]).

    Scalar VMEM loads at dynamic (row, col); stores go through length-1
    dynamic slices (Mosaic rejects plain scalar stores to VMEM).
    """
    from jax.experimental import pallas as pl

    n = a0_ref.shape[0]

    def body(i, _):
        a0 = a0_ref[i]
        a1 = a1_ref[i]
        r = r_ref[i]
        v0 = field_ref[a0, r]
        v1 = field_ref[a1, r]
        out_ref[pl.ds(i, 1)] = jnp.minimum(v0, v1).reshape(1)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def resample_min2(
    field: jnp.ndarray,
    a0: jnp.ndarray,
    a1: jnp.ndarray,
    r_idx: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-cell two-point window min over the [A, R] field.

    a0/a1/r_idx: i32[H, W] indices. Returns f32[H, W].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = a0.shape
    n = int(np.prod(shape))
    out = pl.pallas_call(
        _resample_kernel,
        out_shape=jax.ShapeDtypeStruct((n,), field.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        field,
        a0.reshape(-1).astype(jnp.int32),
        a1.reshape(-1).astype(jnp.int32),
        r_idx.reshape(-1).astype(jnp.int32),
    )
    return out.reshape(shape)


def vmem_budget_ok(A: int, R: int, num_cells: int) -> bool:
    """Field + index/output buffers must fit comfortably in ~16 MB VMEM."""
    field_bytes = A * R * 4
    io_bytes = 4 * num_cells * 4
    return field_bytes + io_bytes < 10 * 1024 * 1024
