"""Image front-end ops: pyramid, FAST, orientation, rBRIEF, stereo matching.

These are the TPU-native replacements for the reference's ORBextractor
(/root/reference/src/ORBextractor.cc) and Frame stereo matcher
(/root/reference/src/Frame.cc:630): everything is a batched tensor op over
whole images / fixed-capacity keypoint arrays with validity masks — no
per-feature loops, no dynamic shapes.
"""

from tpuslam.ops.image import gaussian_blur, pyramid_resize, build_pyramid
from tpuslam.ops.orb import ORBConfig, ORBFeatures, extract_orb
from tpuslam.ops.stereo import stereo_match
