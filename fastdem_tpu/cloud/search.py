"""Spatial neighbor search: brute-force and voxel-bucket kNN / radius.

TPU-native replacement for nanoPCL's KdTree / VoxelHash
(/root/reference/fastdem/lib/nanoPCL/include/nanopcl/search/kdtree.hpp:20-49,
search/voxel_hash.hpp:22-60). Tree traversal is hostile to SIMD/XLA; instead:

  * brute: chunked [B, N] distance tiles + top_k — exact, MXU-shaped
    (|p-q|^2 via the Gram-matrix expansion), right for N up to ~100K.
  * bucket: sort points into voxel buckets (lexicographic sort, CSR ranges
    via searchsorted), gather up to M candidates from each of the 27
    neighboring buckets, top_k over the 27*M candidates — approximate only
    when a bucket overflows M or the true neighbor lies beyond the adjacent
    buckets; with bucket_size >= search radius the radius query is exact up
    to the M cap.

All queries return fixed-shape (indices, distances) with invalid entries
marked by index -1 / distance +inf, so downstream consumers stay jittable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INF = jnp.inf

_NEIGHBOR_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]


def knn_brute(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    queries: Optional[jnp.ndarray] = None,
    exclude_self: bool = True,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN by chunked dense distances. Returns (idx i32[Q, k],
    dist f32[Q, k]); padding entries idx=-1, dist=inf."""
    q = xyz if queries is None else queries
    n = xyz.shape[0]
    d2_base = jnp.sum(xyz * xyz, axis=1)

    def one_chunk(qc):
        qq, self_idx = qc
        # |q - p|^2 = |q|^2 + |p|^2 - 2 q.p  (the matmul runs on the MXU)
        d2 = (
            jnp.sum(qq * qq, axis=1)[:, None]
            + d2_base[None, :]
            - 2.0 * (qq @ xyz.T)
        )
        d2 = jnp.where(mask[None, :], d2, _INF)
        if exclude_self:
            cols = jnp.arange(n, dtype=jnp.int32)[None, :]
            d2 = jnp.where(cols == self_idx[:, None], _INF, d2)
        neg, idx = jax.lax.top_k(-d2, k)
        d = -neg
        idx = jnp.where(jnp.isfinite(d), idx, -1)
        return jnp.maximum(d, 0.0), idx

    nq = q.shape[0]
    pad = (-nq) % chunk
    qp = jnp.concatenate([q, jnp.full((pad, 3), 1e9, dtype=q.dtype)])
    self_ids = (
        jnp.concatenate(
            [jnp.arange(nq, dtype=jnp.int32), jnp.full(pad, -1, jnp.int32)]
        )
        if queries is None
        else jnp.full(nq + pad, -1, jnp.int32)
    )
    qp = qp.reshape(-1, chunk, 3)
    self_ids = self_ids.reshape(-1, chunk)
    d, idx = jax.lax.map(one_chunk, (qp, self_ids))
    d = d.reshape(-1, k)[:nq]
    idx = idx.reshape(-1, k)[:nq]
    return idx, jnp.sqrt(d)


class BucketGrid:
    """Sorted voxel-bucket index over a fixed cloud (build once, query many).

    The CSR structure is (sorted point order, per-query searchsorted over
    the sorted bucket keys). Bucket keys are linearized into int32 from
    clipped 10-bit coords around the cloud's bounding box.
    """

    def __init__(self, xyz: jnp.ndarray, mask: jnp.ndarray, bucket_size: float):
        self.xyz = xyz
        self.mask = mask
        self.bucket_size = float(bucket_size)
        mins = jnp.min(jnp.where(mask[:, None], xyz, _INF), axis=0)
        self.origin = jnp.where(jnp.isfinite(mins), mins, 0.0) - bucket_size
        coords = self._coords(xyz)
        key = self._key(coords)
        key = jnp.where(mask, key, jnp.int32(2**31 - 1))
        self.sorted_key, self.order = jax.lax.sort(
            (key, jnp.arange(xyz.shape[0], dtype=jnp.int32)), num_keys=1
        )
        self.sorted_xyz = xyz[self.order]

    _B = 1024  # coords clipped to [0, 1023] per axis

    def _coords(self, p: jnp.ndarray) -> jnp.ndarray:
        c = jnp.floor((p - self.origin) / self.bucket_size).astype(jnp.int32)
        return jnp.clip(c, 0, self._B - 1)

    def _key(self, c: jnp.ndarray) -> jnp.ndarray:
        return (c[..., 0] * self._B + c[..., 1]) * self._B + c[..., 2]

    def candidates(
        self, queries: jnp.ndarray, per_bucket: int = 8
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Candidate point indices from the 27 neighboring buckets.

        Returns (cand_idx i32[Q, 27*M] into the original cloud, valid bool).
        """
        qc = self._coords(queries)
        out_idx = []
        out_valid = []
        n = self.sorted_key.shape[0]
        for off in _NEIGHBOR_OFFSETS:
            nb = qc + jnp.asarray(off, dtype=jnp.int32)
            ok = jnp.all((nb >= 0) & (nb < self._B), axis=-1)
            key = self._key(nb)
            start = jnp.searchsorted(self.sorted_key, key, side="left")
            end = jnp.searchsorted(self.sorted_key, key, side="right")
            for m in range(per_bucket):
                pos = start + m
                valid = ok & (pos < end)
                pos = jnp.clip(pos, 0, n - 1)
                out_idx.append(jnp.where(valid, self.order[pos], -1))
                out_valid.append(valid)
        return jnp.stack(out_idx, axis=1), jnp.stack(out_valid, axis=1)

    def knn(
        self, queries: jnp.ndarray, k: int, per_bucket: int = 8,
        exclude_self_idx: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cand, valid = self.candidates(queries, per_bucket)
        cpts = self.xyz[jnp.maximum(cand, 0)]
        d2 = jnp.sum((cpts - queries[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(valid, d2, _INF)
        if exclude_self_idx is not None:
            d2 = jnp.where(cand == exclude_self_idx[:, None], _INF, d2)
        neg, pos = jax.lax.top_k(-d2, k)
        d2k = -neg
        idx = jnp.take_along_axis(cand, pos, axis=1)
        idx = jnp.where(jnp.isfinite(d2k), idx, -1)
        return idx, jnp.sqrt(jnp.maximum(d2k, 0.0))

    def radius_count(
        self, queries: jnp.ndarray, radius: float, per_bucket: int = 8,
        exclude_self_idx: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Number of points within radius (exact when bucket_size >= radius
        and no bucket overflows per_bucket)."""
        cand, valid = self.candidates(queries, per_bucket)
        cpts = self.xyz[jnp.maximum(cand, 0)]
        d2 = jnp.sum((cpts - queries[:, None, :]) ** 2, axis=-1)
        ok = valid & (d2 <= radius * radius)
        if exclude_self_idx is not None:
            ok = ok & (cand != exclude_self_idx[:, None])
        return jnp.sum(ok, axis=1)


def knn(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    bucket_size: Optional[float] = None,
    method: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Self-kNN over the cloud (each point's k nearest other points)."""
    n = xyz.shape[0]
    if method == "auto":
        method = "brute" if n <= 65536 else "bucket"
    if method == "brute":
        return knn_brute(xyz, mask, k)
    if bucket_size is None:
        raise ValueError("bucket method requires bucket_size")
    grid = BucketGrid(xyz, mask, bucket_size)
    return grid.knn(
        xyz, k, exclude_self_idx=jnp.arange(n, dtype=jnp.int32)
    )
