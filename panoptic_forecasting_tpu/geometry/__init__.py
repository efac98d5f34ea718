from .boxes import bbox_ulbr_to_cwh, bbox_cwh_to_ulbr
from .camera import (
    Intrinsics,
    intrinsics_from_cityscapes_camera,
    intrinsics_matrix,
    extrinsics_from_cityscapes_camera,
    flu_T_rdf,
    rdf_T_flu,
    backproject_pixels,
    project_points,
)
from .egomotion import unicycle_now_T_prev, unicycle_pose_delta, compose_transforms
