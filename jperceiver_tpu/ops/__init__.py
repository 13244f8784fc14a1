from .geometry import (
    disp_to_depth,
    rot_from_axisangle,
    transformation_from_parameters,
    se3_matrix,
    se3_inverse,
    se3_compose,
    ground_homography,
    backproject,
    project,
)
from .sampling import (
    grid_sample,
    warp_perspective,
    resize_bilinear,
    resize_nearest,
    resize_area,
    upsample2x_nearest,
)
from .ssim import ssim
from .photometric import robust_l1, reprojection_loss
from .smoothness import edge_aware_smoothness
from .seg_losses import (
    soft_iou_loss,
    soft_dice_loss,
    tversky_loss,
    focal_loss,
    weighted_cross_entropy,
    boundary_loss,
    topview_seg_loss,
)
from .sdf import signed_distance_field
