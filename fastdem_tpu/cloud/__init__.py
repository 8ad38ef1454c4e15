"""Point-cloud library: container, transforms, filters, search, geometry,
segmentation, registration (the nanoPCL-equivalent surface)."""

from fastdem_tpu.cloud.pointcloud import (  # noqa: F401
    PointCloud,
    bucket_capacity,
    compact,
    erase,
    extract,
    from_numpy,
    merge,
    pad_to,
)
