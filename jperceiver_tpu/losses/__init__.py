from .cgt import cgt_scale_label, assumption_quad_points
from .multitask import compute_losses, total_loss
