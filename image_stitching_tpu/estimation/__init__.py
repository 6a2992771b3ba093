"""Registration estimation: component filter, focal/rotation bootstrap,
bundle adjustment, wave correction."""

from .components import biggest_component, DisjointSets
from .wave_correct import wave_correct
from .bundle_adjust import bundle_adjust, pack_correspondences, BAProblem
from .homography_estimator import (focals_from_homography, estimate_focal,
                                   estimate_rotations_from_homographies,
                                   homography_based_estimate,
                                   affine_based_estimate)
from .pose_infill import infill_dropped_cameras
from .graph import matches_graph_dot
