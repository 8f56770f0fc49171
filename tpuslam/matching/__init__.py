"""Descriptor matching: 256-bit Hamming kernels and the search modes of the
reference's ORBmatcher (/root/reference/src/ORBmatcher.cc)."""

from tpuslam.matching.hamming import hamming_distance, hamming_matrix
from tpuslam.matching.search import (
    TH_HIGH,
    TH_LOW,
    match_nn_ratio,
    rotation_consistency_mask,
    search_by_projection_frame,
    search_by_projection_points,
    search_for_initialization,
)
