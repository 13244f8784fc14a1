from .optim import build_optimizer, build_lr_schedule
from .train_state import TrainState, create_train_state
from .trainer import make_train_step, make_eval_step, Trainer
from .eval_hook import EvalHook, depth_metrics_single, eigen_crop_mask
from .checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    load_weights,
    import_torch_resnet,
    load_torch_resnet_file,
)
from .logger import JsonLogger, get_root_logger
from .env import set_random_seed, device_summary, enable_compile_cache
