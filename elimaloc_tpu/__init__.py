"""elimaloc_tpu — a TPU-native EKF + LiDAR map-matching localization engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ELiMaLoc
(EKF-based LiDAR-Inertial Map-matching Localization): motion deskewing, a
device-resident voxel-hash map, four ICP variants (P2P/GICP/VGICP/AVGICP),
and a 27-state error-state EKF fusing IMU/GNSS/CAN/map-matching — fused into
jitted per-event steps and replayed over logs instead of ROS topics.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import (  # noqa: F401
    CalibConfig,
    ElimalocConfig,
    EkfConfig,
    GnssSource,
    GpsType,
    IcpMethod,
    PcmConfig,
    ShapeBudget,
)
