"""End-to-end CLI test: train 1 epoch on a fake KITTI odometry tree."""

import json
import os
import textwrap

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fake_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    seq = root / "00"
    (seq / "image_2").mkdir(parents=True)
    (seq / "road_dense128").mkdir()
    rng = np.random.default_rng(0)
    for i in range(13):
        img = rng.uniform(0, 255, (96, 320, 3)).astype(np.uint8)
        Image.fromarray(img).save(seq / "image_2" / f"{i:06d}.png")
        lbl = np.zeros((128, 128), np.uint8)
        lbl[60:120, 40:90] = 255
        Image.fromarray(lbl).save(seq / "road_dense128" / f"{i:06d}.png")
    with open(seq / "calib.txt", "w") as f:
        f.write("P2: 707.0 0 601.8 45.4 0 707.0 183.1 -0.3 0 0 1 0.002\n")
        f.write(
            "Tr: 0 -1 0 -0.01 0 0 -1 -0.075 1 0 0 -0.27\n"
        )
    splits = root / "splits" / "odometry"
    splits.mkdir(parents=True)
    # 8 virtual devices x imgs_per_gpu=1 -> global batch 8; need >= 8 usable
    lines = [f"00/road_dense128/{i:06d}.png" for i in range(1, 12)]
    (splits / "train_files.txt").write_text("\n".join(lines) + "\n")
    (splits / "val_files.txt").write_text(lines[0] + "\n")
    return root


def test_train_cli_one_epoch(fake_tree, tmp_path):
    cfg_py = tmp_path / "cfg.py"
    cfg_py.write_text(textwrap.dedent(f"""
        HEIGHT = 128
        WIDTH = 128
        data = dict(
            name="kitti_odom", type="static", split="odometry",
            split_dir={str(fake_tree / 'splits')!r},
            height=HEIGHT, width=WIDTH, frame_ids=[0, -1, 1],
            in_path={str(fake_tree)!r},
        )
        model = dict(
            name="JPerceiver", depth_num_layers=18, pose_num_layers=18,
            frame_ids=[0, -1, 1], height=HEIGHT, width=WIDTH,
            scales=[0, 1, 2, 3], min_depth=0.1, max_depth=100.0,
            automask=True, disp_norm=True, smoothness_weight=1e-3,
            scale_weight=0.1, dynamic_weight=15.0, static_weight=5.0,
            occ_map_size=32, num_class=2, loss_type="iou",
            loss_weight=1, loss_sum=1, type="static", split="odometry",
            cgt_label_hw=(94, 310),
        )
        total_epochs = 1
        imgs_per_gpu = 1
        learning_rate = 1e-4
        workers_per_gpu = 2
        validate = True
        optimizer = dict(type="Adam", lr=learning_rate, weight_decay=0)
        optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
        lr_config = dict(policy="step", warmup=None, step=[50])
        checkpoint_config = dict(interval=1)
        log_config = dict(interval=1)
    """))

    from jperceiver_tpu.tools.train import main

    work = tmp_path / "work"
    main([
        "--config", str(cfg_py),
        "--work_dir", str(work),
        "--max_steps_per_epoch", "2",
    ])

    logs = [p for p in os.listdir(work) if p.endswith(".log.json")]
    assert logs, "no log file written"
    lines = [json.loads(l) for l in open(work / logs[0])]
    train_lines = [l for l in lines if l.get("mode") == "train"]
    assert train_lines and np.isfinite(train_lines[-1]["loss"])
    val_lines = [l for l in lines if l.get("mode") == "val"]
    assert val_lines and "road_iou" in val_lines[-1]
    assert os.path.isdir(work / "checkpoints")
