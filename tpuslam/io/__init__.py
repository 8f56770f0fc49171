"""Dataset readers, settings parsing, and trajectory export.

Counterparts of the reference's example drivers
(/root/reference/Examples/{Monocular,Stereo,RGB-D}/*.cc): TUM / KITTI /
EuRoC sequence loaders and the OpenCV-YAML settings schema parsed by
Tracking::Tracking (/root/reference/src/Tracking.cc:54-160).
"""

from tpuslam.io.settings import load_settings, Settings
from tpuslam.io.datasets import (
    TUMSequence,
    KITTISequence,
    EuRoCSequence,
    load_grayscale,
)
