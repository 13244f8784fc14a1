"""Data pipeline tests on a generated fake KITTI odometry tree."""

import os

import numpy as np
import pytest
from PIL import Image

from jperceiver_tpu.data import (
    DataLoader,
    KittiOdometry,
    generate_depth_map,
    load_odometry_calib,
)
from jperceiver_tpu.data.calib import read_calib_file


@pytest.fixture(scope="module")
def fake_odom(tmp_path_factory):
    """Sequence 00 with 4 frames: images, road labels, calib, velodyne."""
    root = tmp_path_factory.mktemp("kitti_odom")
    seq = root / "00"
    (seq / "image_2").mkdir(parents=True)
    (seq / "road_dense128").mkdir()
    (seq / "velodyne").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.uniform(0, 255, (64, 128, 3))).astype(np.uint8)
        Image.fromarray(img).save(seq / "image_2" / f"{i:06d}.png")
        lbl = np.zeros((128, 128), np.uint8)
        lbl[40:120, 30:90] = 255
        Image.fromarray(lbl).save(seq / "road_dense128" / f"{i:06d}.png")
        pts = rng.uniform(-5, 30, (500, 4)).astype(np.float32)
        pts[:, 0] = np.abs(pts[:, 0]) + 1
        pts.tofile(seq / "velodyne" / f"{i:06d}.bin")
    with open(seq / "calib.txt", "w") as f:
        f.write("P0: 707.0 0 601.8 0 0 707.0 183.1 0 0 0 1 0\n")
        f.write("P1: 707.0 0 601.8 -386.1 0 707.0 183.1 0 0 0 1 0\n")
        f.write("P2: 707.0 0 601.8 45.4 0 707.0 183.1 -0.3 0 0 1 0.002\n")
        f.write("P3: 707.0 0 601.8 -333.5 0 707.0 183.1 2.2 0 0 1 0.003\n")
        f.write(
            "Tr: 0.0002 -0.9999 -0.0106 -0.0028 0.0104 0.0106 -0.9998 -0.0752 "
            "0.9999 0.0002 0.0105 -0.2721\n"
        )
    return str(root)


def test_odometry_calib(fake_odom):
    K, T = load_odometry_calib(os.path.join(fake_odom, "00"))
    assert K.shape == (4, 4) and T.shape == (4, 4)
    assert np.isclose(K[0, 0], 707.0)
    # cam2 baseline shift folded in: x-translation differs from Tr's.
    assert not np.isclose(T[0, 3], -0.0028)
    # Rotation block stays orthonormal.
    R = T[:3, :3]
    # fake calib is hand-typed to ~4 digits, so orthonormal only loosely
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)


def test_dataset_sample_schema(fake_odom):
    ds = KittiOdometry(
        data_path=os.path.join(fake_odom),
        filenames=["00/road_dense128/000001.png"],
        height=128,
        width=128,
        is_train=True,
        with_sdf=True,
    )
    s = ds[0]
    assert s["color"].shape == (3, 128, 128, 3)
    assert s["color_aug"].shape == (3, 128, 128, 3)
    assert s["bev_static"].shape == (32, 32)
    assert set(np.unique(s["bev_static"])) <= {0.0, 1.0}
    assert s["bev_static"].sum() > 0
    assert s["bev_static_sdf"].shape == (32, 32, 1)
    assert s["K"].shape == (4, 4)
    assert np.isclose(s["K"][0, 0], 0.58 * 128)
    assert s["color"].dtype == np.float32
    assert 0 <= s["color"].min() and s["color"].max() <= 1


def test_dataset_edge_frame_fallback(fake_odom):
    """Frame 0 has no frame -1; the loader falls back to frame 0."""
    ds = KittiOdometry(
        data_path=fake_odom,
        filenames=["00/road_dense128/000000.png"],
        height=128,
        width=128,
        is_train=False,
    )
    s = ds[0]
    np.testing.assert_array_equal(s["color"][0], s["color"][1])


def test_loader_sharding_and_determinism(fake_odom):
    names = [f"00/road_dense128/{i:06d}.png" for i in range(4)]
    ds = KittiOdometry(fake_odom, names, 128, 128, is_train=False)

    def batches(rank):
        dl = DataLoader(ds, batch_size=1, shuffle=True, num_workers=2,
                        seed=7, process_index=rank, process_count=2)
        dl.set_epoch(3)
        return list(dl)

    b0, b1 = batches(0), batches(1)
    assert len(b0) == 2 and len(b1) == 2
    # Same epoch/seed -> deterministic; the two ranks see disjoint samples.
    b0_again = batches(0)
    for a, b in zip(b0, b0_again):
        np.testing.assert_array_equal(a["color"], b["color"])
    all_imgs = [b["color"].sum() for b in b0 + b1]
    assert len(set(np.round(all_imgs, 3))) == 4  # all distinct


def test_generate_depth_map_matches_reference_alg(fake_odom, tmp_path):
    """Vectorized dedup == the reference's Counter-loop algorithm."""
    calib_dir = tmp_path / "2011_09_26"
    calib_dir.mkdir()
    with open(calib_dir / "calib_cam_to_cam.txt", "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write("P_rect_02: 100 0 60 0 0 100 30 0 0 0 1 0\n")
        f.write("S_rect_02: 120 60\n")
    with open(calib_dir / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: 0 -1 0 0 0 -1 1 0 0\n")
        f.write("T: 0 0 0\n")

    rng = np.random.default_rng(1)
    pts = np.zeros((2000, 4), np.float32)
    pts[:, 0] = rng.uniform(2, 50, 2000)   # forward
    pts[:, 1] = rng.uniform(-10, 10, 2000)
    pts[:, 2] = rng.uniform(-2, 1, 2000)
    velo_file = tmp_path / "velo.bin"
    pts.tofile(velo_file)

    depth = generate_depth_map(str(calib_dir), str(velo_file), 2)
    assert depth.shape == (60, 120)
    assert (depth >= 0).all()
    assert (depth > 0).sum() > 100

    # Reference algorithm: python-loop duplicate resolution (min depth).
    from collections import Counter

    P = np.array([[100, 0, 60, 0], [0, 100, 30, 0], [0, 0, 1, 0]], np.float64)
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)
    T4 = np.eye(4)
    T4[:3, :3] = R
    velo = pts.copy().astype(np.float64)
    velo[:, 3] = 1
    velo = velo[velo[:, 0] >= 0]
    proj = (P @ T4 @ velo.T).T
    proj[:, :2] /= proj[:, 2:3]
    xs = np.round(proj[:, 0]) - 1
    ys = np.round(proj[:, 1]) - 1
    ok = (xs >= 0) & (ys >= 0) & (xs < 120) & (ys < 60)
    xs, ys, zs = xs[ok].astype(int), ys[ok].astype(int), proj[ok, 2]
    ref = np.zeros((60, 120))
    ref[ys, xs] = zs
    lin = ys * 120 + xs
    for dd in [k for k, c in Counter(lin).items() if c > 1]:
        sel = lin == dd
        ref[ys[sel][0], xs[sel][0]] = zs[sel].min()
    ref[ref < 0] = 0
    np.testing.assert_allclose(depth, ref, atol=1e-4)


def test_read_calib_file_types(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("A: 1 2 3\nB: not a number\n")
    d = read_calib_file(str(p))
    np.testing.assert_array_equal(d["A"], [1, 2, 3])
    assert "B" not in d or isinstance(d.get("B"), np.ndarray) is False


def test_loader_epoch_advances_when_iterator_abandoned(fake_odom):
    """Regression: every epoch must see a fresh permutation even when the
    consumer (Trainer._prefetch) abandons the iterator after len(loader)
    batches instead of driving it to exhaustion."""
    names = [f"00/road_dense128/{i:06d}.png" for i in range(4)]
    ds = KittiOdometry(fake_odom, names, 128, 128, is_train=False)
    dl = DataLoader(ds, batch_size=1, shuffle=True, num_workers=1, seed=7)

    def order():
        sums = []
        it = iter(dl)
        for _ in range(len(dl)):  # abandon without exhausting
            sums.append(round(float(next(it)["color"].sum()), 3))
        return sums

    e0, e1 = order(), order()
    assert set(e0) == set(e1)  # same samples...
    assert e0 != e1  # ...different order
    # set_epoch still pins the permutation (DistSamplerSeedHook contract).
    dl.set_epoch(0)
    assert order() == e0


def test_loader_pad_mask_marks_wraparound(fake_odom):
    names = [f"00/road_dense128/{i:06d}.png" for i in range(3)]
    ds = KittiOdometry(fake_odom, names, 128, 128, is_train=False)
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                    drop_last=False)
    batches = list(dl)
    assert len(batches) == 2
    got = np.concatenate([b["_valid"] for b in batches])
    np.testing.assert_array_equal(got, [True, True, True, False])


def test_loader_worker_error_surfaces(fake_odom):
    class Broken:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise ValueError("corrupt sample")

    dl = DataLoader(Broken(), batch_size=1, shuffle=False, num_workers=1)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(dl)


def test_make_splits_cli(tmp_path):
    """Split-list + gt_pose generation (the reference ships these as files)."""
    import numpy as np

    from jperceiver_tpu.tools.make_splits import main as make_splits

    # odometry tree: two sequences with road labels
    for seq in ("00", "09"):
        d = tmp_path / "seq" / seq / "road_dense128"
        d.mkdir(parents=True)
        for i in range(3):
            (d / f"{i:06d}.png").write_bytes(b"x")
    make_splits(["odometry", "--data", str(tmp_path / "seq"),
                 "--train_seqs", "00", "--val_seqs", "09",
                 "--out", str(tmp_path / "splits")])
    train = (tmp_path / "splits/odometry/train_files.txt").read_text().splitlines()
    val = (tmp_path / "splits/odometry/val_files.txt").read_text().splitlines()
    assert len(train) == 3 and train[0] == "00/road_dense128/000000.png"
    assert len(val) == 3 and val[0].startswith("09/")

    # gt_pose passthrough
    poses = tmp_path / "poses"
    poses.mkdir()
    np.savetxt(poses / "09.txt", np.eye(4)[:3].reshape(1, 12))
    make_splits(["gt_pose", "--data", str(poses),
                 "--out", str(tmp_path / "gt_pose")])
    assert (tmp_path / "gt_pose/09.txt").exists()

    # cityscape buckets (reference gen_cityscape_split.py semantics)
    cs = tmp_path / "cs"
    for part, city in (("train", "aachen"), ("val", "frankfurt"),
                       ("test", "berlin")):
        d = cs / "leftImg8bit_sequence" / part / city
        d.mkdir(parents=True)
        (d / f"{city}_000000_000000_leftImg8bit.png").write_bytes(b"x")
    make_splits(["cityscape", "--data", str(cs),
                 "--out", str(tmp_path / "splits")])
    for part, city in (("train", "aachen"), ("val", "frankfurt"),
                       ("test", "berlin")):
        lines = (tmp_path / f"splits/cityscape/{part}.txt").read_text().splitlines()
        assert len(lines) == 1 and city in lines[0]

    # kitti_shot_sequence fixed demo list (reference gen_split.py)
    make_splits(["shot_sequence", "--data", "unused",
                 "--out", str(tmp_path / "splits")])
    shot = (tmp_path / "splits/kitti_shot_sequence/val_files.txt"
            ).read_text().splitlines()
    assert len(shot) == 108
    assert shot[0] == "2011_09_26/2011_09_26_drive_0001_sync 0000000000 l"
