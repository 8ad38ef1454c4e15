"""Post-processing ops: raycasting, inpainting, smoothing, UF, features.

``apply_postprocess_fn`` mirrors the reference node's async post-processing
chain (ros2/src/fastdem_ros_node.cpp:208-245): on a snapshot of
{elevation, upper_bound, lower_bound} run uncertainty fusion -> inpainting
(in place) -> feature extraction, and derive uncertainty_range =
upper - lower. Returned as a single jittable function over the three layer
arrays so a runtime driver can overlap it with mapping.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from fastdem_tpu.config.config import PostProcessConfig
from fastdem_tpu.postprocess.features import (  # noqa: F401
    apply_feature_extraction,
    extract_features,
)
from fastdem_tpu.postprocess.inpainting import apply_inpainting, inpaint  # noqa: F401
from fastdem_tpu.postprocess.raycasting import apply_raycasting  # noqa: F401
from fastdem_tpu.postprocess.smoothing import (  # noqa: F401
    apply_spatial_smoothing,
    smooth_median,
)
from fastdem_tpu.postprocess.uncertainty_fusion import (  # noqa: F401
    apply_uncertainty_fusion,
    fuse_bounds,
)


def apply_postprocess_fn(geom, cfg: PostProcessConfig):
    """Build the snapshot post-processing function.

    Returns fn(elevation, upper, lower) -> dict of output layers.
    """

    def run(elevation, upper, lower) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        if cfg.uncertainty_fusion.enabled:
            upper, lower = fuse_bounds(
                upper, lower, cfg.uncertainty_fusion, geom.resolution
            )
        if cfg.inpainting.enabled:
            elevation = inpaint(
                elevation,
                cfg.inpainting.max_iterations,
                cfg.inpainting.min_valid_neighbors,
            )
        out["elevation"] = elevation
        out["upper_bound"] = upper
        out["lower_bound"] = lower
        out["uncertainty_range"] = upper - lower
        if cfg.feature_extraction.enabled:
            feats = extract_features(
                elevation, cfg.feature_extraction, geom.resolution
            )
            ok = feats.pop("ok")
            for k, v in feats.items():
                out[k] = jnp.where(ok, v, jnp.nan)
        return out

    return run
