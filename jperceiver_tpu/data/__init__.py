from .synthetic import synthetic_batch, kitti_like_calib
