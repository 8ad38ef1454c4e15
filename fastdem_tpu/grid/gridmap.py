"""Dense multi-layer grid map state (nanoGrid equivalent) as a JAX pytree.

Re-expresses the ``nanogrid::GridMap`` contract consumed by FastDEM
(reference call sites cataloged in SURVEY.md section 2.3; e.g.
/root/reference/fastdem/include/fastdem/elevation_map.hpp:65-177) as a
functional pytree: ``{layers: dict[str, f32[H, W]], position: f32[2]}`` plus a
static, hashable ``GridGeometry``.

Unmeasured cells hold NaN, matching the reference convention
(elevation_map.hpp:63). All updates are pure: every op returns a new state.

The circular buffer of the reference is replaced by a world-aligned layout;
``move`` rolls the data and invalidates wrapped-in cells in a single fused
pass (see grid/geometry.py module docstring for rationale).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdem_tpu.grid.geometry import GridGeometry

# ---------------------------------------------------------------------------
# Canonical layer names (reference: include/fastdem/elevation_map.hpp:28-46)
# ---------------------------------------------------------------------------


class layers:
    """Canonical layer name constants."""

    elevation = "elevation"
    elevation_min = "elevation_min"
    elevation_max = "elevation_max"
    variance = "variance"
    n_points = "n_points"
    upper_bound = "upper_bound"
    lower_bound = "lower_bound"

    # Per-frame layers
    obstacle = "obstacle"
    intensity = "intensity"
    color = "color"

    # Post-processing layers
    elevation_inpainted = "elevation_inpainted"
    ghost_removal = "ghost_removal"
    raycasting = "raycasting"
    visibility_logodds = "_visibility_logodds"
    step = "step"
    slope = "slope"
    roughness = "roughness"
    curvature = "curvature"
    normal_x = "_normal_x"
    normal_y = "_normal_y"
    normal_z = "_normal_z"

    # Kalman estimator internals (kalman_estimation.hpp:28-30)
    kalman_p = "_kalman_p"
    sample_mean = "_sample_mean"
    sample_m2 = "_sample_m2"

    # P2 quantile estimator internals (quantile_estimation.hpp:26-35)
    p2_q = ("_p2_q0", "_p2_q1", "_p2_q2", "_p2_q3", "_p2_q4")
    p2_n = ("_p2_n0", "_p2_n1", "_p2_n2", "_p2_n3", "_p2_n4")


def is_internal(name: str) -> bool:
    """Internal layers use a '_' prefix and are excluded from visualization
    (reference: elevation_map.hpp:43-45)."""
    return name.startswith("_")


# ---------------------------------------------------------------------------
# GridMapState pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GridMapState:
    """Traced per-frame map state.

    Attributes:
      layers: name -> f32[rows, cols]. The key set is fixed per compiled
        pipeline (static); values are traced.
      position: f32[2] world coordinates of the map center.
    """

    layers: Dict[str, jnp.ndarray]
    position: jnp.ndarray

    # Convenience (host-side) accessors -------------------------------------
    def get(self, name: str) -> jnp.ndarray:
        return self.layers[name]

    def has(self, name: str) -> bool:
        return name in self.layers

    def replace_layer(self, name: str, value: jnp.ndarray) -> "GridMapState":
        new = dict(self.layers)
        new[name] = value
        return GridMapState(layers=new, position=self.position)

    def replace_layers(self, updates: Mapping[str, jnp.ndarray]) -> "GridMapState":
        new = dict(self.layers)
        new.update(updates)
        return GridMapState(layers=new, position=self.position)


def create(
    geom: GridGeometry,
    layer_fills: Mapping[str, float],
    position: Sequence[float] = (0.0, 0.0),
) -> GridMapState:
    """Allocate a map with the given layers, each filled with a constant
    (NaN for 'unmeasured', matching nanogrid add(name, fill))."""
    shape = geom.shape
    lyr = {
        name: jnp.full(shape, fill, dtype=jnp.float32)
        for name, fill in layer_fills.items()
    }
    return GridMapState(
        layers=lyr, position=jnp.asarray(position, dtype=jnp.float32)
    )


def default_layer_fills() -> Dict[str, float]:
    """The three always-present layers (elevation_map.hpp:101-103)."""
    return {
        layers.elevation: np.nan,
        layers.elevation_min: np.nan,
        layers.elevation_max: np.nan,
    }


# ---------------------------------------------------------------------------
# Map ops (pure)
# ---------------------------------------------------------------------------


def clear_all(state: GridMapState) -> GridMapState:
    """Reset every layer to NaN (reference GridMap::clearAll semantics as used
    by FastDEM::reset, src/fastdem.cpp:26)."""
    return GridMapState(
        layers={k: jnp.full_like(v, jnp.nan) for k, v in state.layers.items()},
        position=state.position,
    )


def clear_at_mask(state: GridMapState, mask: jnp.ndarray) -> GridMapState:
    """Set all layers to NaN where ``mask`` is True (vectorized clearAt,
    reference elevation_map.hpp:131-135)."""
    return GridMapState(
        layers={
            k: jnp.where(mask, jnp.nan, v) for k, v in state.layers.items()
        },
        position=state.position,
    )


def is_finite_mask(state: GridMapState, name: str) -> jnp.ndarray:
    """1.0 where finite, 0.0 where NaN (reference isFinite,
    elevation_map.hpp:156-159)."""
    return jnp.isfinite(state.layers[name]).astype(jnp.float32)


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """``std::round`` semantics: ties round away from zero.

    ``jnp.round`` rounds half-to-even, which at an exactly half-cell robot
    displacement walks the lattice one cell differently from the reference's
    ``std::round`` (tests/refbuild/nanogrid/nanogrid.hpp:209-213 — the move
    delta the goldens are validated against). Sign-aware floor matches it
    exactly for every float.
    """
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def move(
    geom: GridGeometry, state: GridMapState, new_center: jnp.ndarray
) -> GridMapState:
    """Shift the map so its center tracks ``new_center`` (LOCAL mode).

    Equivalent to nanogrid GridMap::move as called from
    src/elevation_mapping.cpp:112-114: the center snaps to whole-cell
    offsets (the position stays on the original grid lattice) and cells that
    enter the map are invalidated (NaN) in every layer.

    Implementation: the world-aligned layout means the shift IS a data roll.
    With index shift k along rows (k = round(dx / res); row axis points to
    -x so moving +x shifts data to higher row indices):
      new[r, c] = old[r - k, c]; rows wrapping around are cleared.
    """
    res = geom.resolution
    delta = round_half_away((new_center - state.position) / res).astype(
        jnp.int32
    )
    kr, kc = delta[0], delta[1]

    rr = jnp.arange(geom.rows, dtype=jnp.int32)
    cc = jnp.arange(geom.cols, dtype=jnp.int32)
    # Rows/cols that wrapped (entered the map) for either shift sign.
    row_invalid = (rr < kr) | (rr >= geom.rows + kr)
    col_invalid = (cc < kc) | (cc >= geom.cols + kc)
    invalid = row_invalid[:, None] | col_invalid[None, :]

    def shift(a: jnp.ndarray) -> jnp.ndarray:
        a = jnp.roll(a, shift=(kr, kc), axis=(0, 1))
        return jnp.where(invalid, jnp.nan, a)

    new_layers = {k: shift(v) for k, v in state.layers.items()}
    new_position = state.position + delta.astype(jnp.float32) * res
    return GridMapState(layers=new_layers, position=new_position)


def snapshot(state: GridMapState, names: Iterable[str]) -> GridMapState:
    """Lightweight copy with only the given layers (reference
    elevation_map.hpp:161-177). Under JAX arrays are immutable so this is a
    dict subset, not a data copy."""
    return GridMapState(
        layers={n: state.layers[n] for n in names if n in state.layers},
        position=state.position,
    )


def submap_slices(
    geom: GridGeometry,
    position: np.ndarray,
    center_xy: Sequence[float],
    length_xy: Sequence[float],
) -> Tuple[slice, slice]:
    """Host-side helper: row/col slices of the submap window centered at
    ``center_xy`` with extent ``length_xy`` meters, clipped to the map
    (reference nanogrid::SubmapGeometry used at bridge/ros2.hpp:35-46)."""
    pos = np.asarray(position, dtype=np.float64)
    ox = pos[0] + 0.5 * geom.rows * geom.resolution
    oy = pos[1] + 0.5 * geom.cols * geom.resolution
    r0 = int(np.floor((ox - (center_xy[0] + length_xy[0] / 2)) / geom.resolution))
    c0 = int(np.floor((oy - (center_xy[1] + length_xy[1] / 2)) / geom.resolution))
    nr = int(np.ceil(length_xy[0] / geom.resolution))
    nc = int(np.ceil(length_xy[1] / geom.resolution))
    r0 = max(0, r0)
    c0 = max(0, c0)
    r1 = min(geom.rows, r0 + nr)
    c1 = min(geom.cols, c0 + nc)
    return slice(r0, r1), slice(c0, c1)
