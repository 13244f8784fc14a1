from .metrics import (
    AverageMeter,
    compute_depth_errors,
    mean_iu,
    mean_precision,
    confusion_counts,
)
