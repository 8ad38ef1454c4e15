"""Multi-chip map sharding: 2D block-partitioned global maps over a mesh.

The reference is single-threaded on one CPU (SURVEY.md section 2.5); this
module is the new first-class distributed layer required by BASELINE.json:
a fixed-origin global map whose [H, W] layers are block-sharded over a 2D
device mesh ("mx" x "my"), updated with the same integrate pipeline under
``jax.jit`` + ``NamedSharding``. GSPMD partitions the scatter updates and
inserts halo exchanges for the stencil post-processing ops automatically;
per-scan point arrays are replicated (cheap: ~30K points vs multi-GB maps)
so scatters into each block need no cross-device reshuffle of points.

Scaling model (How-to-Scale-Your-Model recipe): pick the mesh, annotate the
shardings, let XLA insert collectives; the block grid maps onto ICI
neighbors so halo exchange is nearest-neighbor ``ppermute`` traffic.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastdem_tpu.grid.gridmap import GridMapState

MAP_AXES = ("mx", "my")


def make_mesh(
    n_devices: Optional[int] = None, shape: Optional[Tuple[int, int]] = None
) -> Mesh:
    """Build a 2D map mesh. ``shape`` defaults to the most-square factoring
    of the device count (e.g. 8 -> 4x2) so block halos are short on both
    axes."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        a = int(math.sqrt(n))
        while n % a != 0:
            a -= 1
        shape = (n // a, a)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, MAP_AXES)


def map_sharding(mesh: Mesh) -> NamedSharding:
    """Layer sharding: rows over 'mx', cols over 'my'."""
    return NamedSharding(mesh, P(*MAP_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, state: GridMapState) -> GridMapState:
    """A GridMapState-shaped pytree of shardings (for jit in/out_shardings)."""
    lyr = map_sharding(mesh)
    rep = replicated(mesh)
    return GridMapState(
        layers={k: lyr for k in state.layers}, position=rep
    )


def shard_state(state: GridMapState, mesh: Mesh) -> GridMapState:
    """Place an existing state onto the mesh with block sharding.

    Multi-process meshes cannot ``device_put`` remote shards from one
    process; there each process materializes its addressable shards from
    the (identical) host values via make_array_from_callback.
    """
    sh = state_shardings(mesh, state)
    if jax.process_count() == 1:
        return GridMapState(
            layers={
                k: jax.device_put(v, sh.layers[k])
                for k, v in state.layers.items()
            },
            position=jax.device_put(state.position, sh.position),
        )

    def place(value, sharding):
        host = np.asarray(value)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    return GridMapState(
        layers={
            k: place(v, sh.layers[k]) for k, v in state.layers.items()
        },
        position=place(state.position, sh.position),
    )


def build_sharded_integrate(
    geom,
    cfg,
    mesh: Mesh,
    has_intensity: bool = False,
    has_color: bool = False,
    donate: bool = True,
):
    """Jit the integrate step with explicit shardings: map blocks sharded
    over the mesh, scan arrays replicated. Returns (step_fn, shard_fn)."""
    from fastdem_tpu.mapping.pipeline import build_integrate, create_map_state

    # polar_field_impl pinned to "xla": the Pallas polar kernel is
    # validated single-chip; under GSPMD the custom-call's partitioning is
    # not — the XLA formulation partitions like any dense op.
    raw = build_integrate(
        geom, cfg, has_intensity, has_color, jit=False,
        polar_field_impl="xla", window_update=False,
    )
    proto = create_map_state(geom, cfg, (0.0, 0.0), has_intensity, has_color)
    st_sh = state_shardings(mesh, proto)
    rep = replicated(mesh)

    # jit in_shardings must match the argument pytree, so the jitted
    # signature carries exactly the configured channel slots; the wrapper
    # below restores build_integrate's uniform
    # (..., intensity=None, color_packed=None) interface.
    n_chan = int(has_intensity) + int(has_color)

    def fixed(state, xyz, mask, T_bs, T_wb, *chans):
        intensity = chans[0] if has_intensity else None
        color = chans[-1] if has_color else None
        return raw(state, xyz, mask, T_bs, T_wb, intensity, color)

    # out_shardings pins the carried state to the block sharding: without
    # it GSPMD may resolve LOCAL mode's roll (collective permute) to a
    # replicated output, which then mismatches in_shardings on the next
    # call.
    jitted = jax.jit(
        fixed,
        in_shardings=(st_sh,) + (rep,) * (4 + n_chan),
        out_shardings=(st_sh, None),
        donate_argnums=(0,) if donate else (),
    )

    def step(state, xyz, mask, T_bs, T_wb, intensity=None, color_packed=None):
        args = [state, xyz, mask, T_bs, T_wb]
        if has_intensity:
            args.append(intensity)
        if has_color:
            args.append(color_packed)
        return jitted(*args)

    return step, lambda s: shard_state(s, mesh)


def build_sharded_integrate_sequence(
    geom,
    cfg,
    mesh: Mesh,
    has_intensity: bool = False,
    has_color: bool = False,
    donate: bool = True,
    **seq_kwargs,
):
    """Batched replay over a block-sharded map: lax.scan over K replicated
    scans with the carried layers sharded over the mesh — pod-scale offline
    mapping of large global areas (each device keeps only its map blocks in
    HBM; the per-scan scatter partitions like the single-step path).
    Returns (seq_fn, shard_fn) with seq_fn matching
    mapping.pipeline.build_integrate_sequence's signature.
    """
    from fastdem_tpu.mapping.pipeline import (
        build_integrate_sequence,
        create_map_state,
    )

    seq_kwargs.setdefault("polar_field_impl", "xla")  # see above
    # Windowed updates dynamic-slice across block shards (collectives per
    # scan) — the sharded path keeps full-map updates, whose scatters stay
    # shard-local.
    seq_kwargs.setdefault("window_update", False)
    raw = build_integrate_sequence(
        geom, cfg, has_intensity, has_color, jit=False, **seq_kwargs
    )
    proto = create_map_state(geom, cfg, (0.0, 0.0), has_intensity, has_color)
    st_sh = state_shardings(mesh, proto)
    rep = replicated(mesh)
    n_chan = int(has_intensity) + int(has_color)

    def fixed(state, xyz, mask, T_bs, T_wb, *chans):
        intensity = chans[0] if has_intensity else None
        color = chans[-1] if has_color else None
        return raw(state, xyz, mask, T_bs, T_wb, intensity, color)

    jitted = jax.jit(
        fixed,
        in_shardings=(st_sh,) + (rep,) * (4 + n_chan),
        out_shardings=st_sh,
        donate_argnums=(0,) if donate else (),
    )

    def seq(state, xyz, mask, T_bs, T_wb, intensity=None, color_packed=None):
        args = [state, xyz, mask, T_bs, T_wb]
        if has_intensity:
            args.append(intensity)
        if has_color:
            args.append(color_packed)
        return jitted(*args)

    return seq, lambda s: shard_state(s, mesh)
