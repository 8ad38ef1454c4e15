#!/usr/bin/env python
"""Point-cloud library demo: ground segmentation, clustering, registration.

Demonstrates the nanoPCL-equivalent surface: ground extraction on a scene
with obstacles, euclidean clustering of the obstacles, and GICP scan
matching between two displaced views of the scene.
"""
import sys

import numpy as np

from common import Timer, force_platform

force_platform("cpu" if "cpu" in sys.argv else None)

from fastdem_tpu.cloud import pointcloud as pc
from fastdem_tpu.cloud import registration as reg
from fastdem_tpu.cloud import segmentation as segm
from fastdem_tpu.cloud import transform as tfm


def make_scene(rng, n_ground=3000):
    g = np.column_stack(
        [rng.uniform(-5, 5, n_ground), rng.uniform(-5, 5, n_ground),
         rng.normal(0, 0.02, n_ground)]
    )
    boxes = []
    for cx, cy in [(-2, -2), (1.5, 2.0), (3, -1)]:
        m = 250
        boxes.append(
            np.column_stack(
                [cx + rng.uniform(-0.3, 0.3, m), cy + rng.uniform(-0.3, 0.3, m),
                 rng.uniform(0.0, 1.2, m)]
            )
        )
    return np.vstack([g] + boxes).astype(np.float32)


def main():
    rng = np.random.default_rng(7)
    scene = make_scene(rng)
    cloud = pc.from_numpy(scene)

    with Timer("ground segmentation"):
        ground = np.asarray(segm.segment_ground(cloud))
    print(f"ground points: {ground.sum()} / {len(scene)}")

    obstacles = cloud.with_mask(cloud.mask & ~ground)
    with Timer("euclidean clustering"):
        labels = np.asarray(
            segm.euclidean_cluster(obstacles, tolerance=0.4, min_cluster_size=30)
        )
    n_clusters = len(set(labels[labels >= 0].tolist()))
    print(f"obstacle clusters: {n_clusters} (expect 3)")

    with Timer("RANSAC plane"):
        plane = segm.segment_plane(cloud, distance_threshold=0.06)
    print(f"dominant plane fitness: {plane.fitness:.2f}, "
          f"normal: {np.asarray(plane.model.coefficients)[:3].round(3)}")

    # Scan matching: second view displaced by a known transform.
    T_true = np.asarray(tfm.from_rpy(0.01, -0.02, 0.06, t=[0.25, -0.1, 0.03]))
    scene2 = (scene @ T_true[:3, :3].T + T_true[:3, 3]).astype(np.float32)
    with Timer("GICP align"):
        res = reg.align(
            pc.from_numpy(scene2), cloud, method="gicp", max_iterations=30
        )
    T_err = res.T @ T_true
    t_err = np.linalg.norm(T_err[:3, 3] - np.eye(4)[:3, 3])
    print(f"GICP converged={res.converged} iters={res.iterations} "
          f"translation error={t_err*100:.2f} cm")


if __name__ == "__main__":
    main()
