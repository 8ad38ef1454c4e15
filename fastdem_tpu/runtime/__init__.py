"""Runtime: providers, streaming driver, node config, bridges."""

from fastdem_tpu.runtime.driver import MappingDriver  # noqa: F401
from fastdem_tpu.runtime.node_config import NodeConfig  # noqa: F401
from fastdem_tpu.runtime.providers import (  # noqa: F401
    Calibration,
    Odometry,
    StaticCalibration,
    StaticOdometry,
    TransformBuffer,
)
