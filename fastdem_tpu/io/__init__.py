"""IO: npz checkpoints, PNG export, PCD/KITTI/trajectory files, orbax."""

from fastdem_tpu.io.npz import load_npz, save_npz  # noqa: F401
from fastdem_tpu.io.png import PngExportConfig, save_png  # noqa: F401
