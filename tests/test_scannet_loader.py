"""ScanNet loader end-to-end on synthetic on-disk fixtures.

Builds a miniature ScanNet-layout dataset (torch .pth scenes, color/depth/
pose/label images, caption JSON) and exercises ScanNetViews / the
view-acceptance rule / label remaps / batching — the loader contract of
reference dataset/data_loader.py.
"""

import json
import os

import numpy as np
import pytest

from xmask3d_tpu.data.batching import Capacities
from xmask3d_tpu.data.scannet import ScanNetConfig, ScanNetSceneViews, ScanNetViews
from xmask3d_tpu.data.tokenizer import HashTokenizer

LABEL_2D = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
BASE = [0, 1, 2, 3, 4, 6, 7, 8, 10, 11, 13, 14, 15, 17, 18]
NOVEL = [5, 9, 12, 16]


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    from mini_scannet import build_mini_scannet

    return build_mini_scannet(tmp_path_factory.mktemp("scannet"), n_views=1)


def _cfg(root, split="train"):
    return ScanNetConfig(
        data_root=str(root / "scannet_3d"),
        data_root_2d=str(root / "scannet_2d"),
        caption_path=str(root / "caption.json"),
        label_2d=LABEL_2D,
        base_category=BASE,
        novel_category=NOVEL,
        ignore_category=[19, 20],
        voxel_size=0.05,
        split=split,
        loop=2,
    )


def test_train_loader_sample_and_batch(mini_dataset):
    caps = Capacities(max_points=4096, max_voxels=4096, max_targets=24)
    ds = ScanNetViews(_cfg(mini_dataset), caps, HashTokenizer(), seed=0)
    assert len(ds) == 2  # 1 scene x loop 2
    s = ds.get(0)
    npts = len(s.labels_3d)
    assert 400 < npts < 65000  # acceptance rule held
    assert s.img.shape == (512, 512, 3)
    assert s.label_2d.shape == (512, 512)
    # train labels are compacted to 0..14; the ignore sentinel 20 compacts
    # to 15 == cfg.ignore_label (reference data_loader.py:121-131)
    assert set(np.unique(s.labels_3d)) <= set(range(len(BASE))) | {15}
    assert s.binary_label_2d.shape == (128, 128)
    assert s.caption_tokens.shape == (77,)

    batch = ds.batch([0])
    assert batch["img"].shape == (1, 512, 512, 3)
    assert batch["point_valid"][0].sum() == min(npts, caps.max_points)
    assert batch["hierarchy"].levels[0].coords.shape == (1, 4096, 3)


def test_scene_views_loader(mini_dataset):
    caps = Capacities(max_points=4096, max_voxels=4096, max_targets=24)
    ds = ScanNetSceneViews(_cfg(mini_dataset, split="val"), caps, HashTokenizer())
    scene = ds.scene(0)
    assert scene["name"] == "scene0000_00"
    assert len(scene["views"]) == 1
    assert scene["coords"].shape[0] == 4000
    v = scene["views"][0]
    assert v["visible"].sum() == len(v["sample"].labels_3d)
    # val labels are NOT compacted
    assert set(np.unique(v["sample"].labels_3d)) <= set(range(19)) | {20}


@pytest.fixture(scope="module")
def multi_view_dataset(tmp_path_factory):
    """One scene, 5 views; views 1 and 3 are unacceptable (zero depth)."""
    import imageio.v2 as imageio
    import torch

    root = tmp_path_factory.mktemp("scannet_mv")
    for split in ("train", "val"):
        d3 = root / "scannet_3d" / split
        d3.mkdir(parents=True)
        rng = np.random.RandomState(0)
        n = 4000
        pts = np.zeros((n, 3))
        pts[:, 0] = rng.uniform(-1.5, 1.5, n)
        pts[:, 1] = rng.uniform(-1.0, 1.0, n)
        pts[:, 2] = rng.uniform(1.0, 3.0, n)
        colors = rng.uniform(-1, 1, (n, 3))
        labels = rng.randint(0, 19, n).astype(np.float64)
        torch.save((pts, colors, labels), d3 / "scene0001_00_vh_clean_2.pth")

    d2 = root / "scannet_2d" / "scene0001_00"
    for sub in ["color", "depth", "pose", "label"]:
        (d2 / sub).mkdir(parents=True)
    rng = np.random.RandomState(1)
    img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    lbl = rng.choice(LABEL_2D, size=(480, 640)).astype(np.uint8)
    captions = {}
    for i in range(5):
        np.savetxt(d2 / "pose" / f"{i}.txt", np.eye(4))
        imageio.imwrite(d2 / "color" / f"{i}.jpg", img)
        depth_mm = 0 if i in (1, 3) else 2000  # zero depth -> no visible pts
        imageio.imwrite(
            d2 / "depth" / f"{i}.png",
            np.full((240, 320), depth_mm, np.uint16),
        )
        imageio.imwrite(d2 / "label" / f"{i}.png", lbl)
        captions[str(i)] = f"view {i}"
    (root / "caption.json").write_text(
        json.dumps({"scene0001_00": captions})
    )
    return root


def test_val_view_iteration_is_deterministic(multi_view_dataset):
    """val/test view selection replicates the reference's epoch-indexed
    iteration (data_loader.py:149-160,199-201): start at epoch % n_views,
    advance by 2 on every rejection, wrap modulo n_views.

    Views 1 and 3 are rejected (zero depth), so:
      epoch 0 -> try [0]          -> accept 0
      epoch 1 -> try [1, 3, 0]    -> accept 0
      epoch 2 -> try [2]          -> accept 2
      epoch 6 -> try [1, 3, 0]    -> accept 0   (wraps: 6 % 5 == 1)
    """
    caps = Capacities(max_points=4096, max_voxels=4096, max_targets=24)
    ds = ScanNetViews(
        _cfg(multi_view_dataset, split="val"), caps, HashTokenizer(), seed=0
    )
    attempts = []
    orig = ds._load_view

    def spy(scene_name, img_dir, locs):
        attempts.append(int(os.path.basename(img_dir)[:-4]))
        return orig(scene_name, img_dir, locs)

    ds._load_view = spy

    for epoch, expect_tries in [(0, [0]), (1, [1, 3, 0]), (2, [2]), (6, [1, 3, 0])]:
        attempts.clear()
        ds.epoch = epoch
        ds.get(0)
        assert attempts == expect_tries, (epoch, attempts)

    # same epoch twice -> identical sequence (run-to-run reproducibility)
    attempts.clear()
    ds.epoch = 1
    ds.get(0)
    first = list(attempts)
    attempts.clear()
    ds.get(0)
    assert attempts == first

    # train split keeps random sampling: over a few epochs the rejected
    # views are never returned, and selection ignores .epoch
    ds_train = ScanNetViews(
        _cfg(multi_view_dataset, split="train"), caps, HashTokenizer(), seed=0
    )
    chosen = set()
    for _ in range(8):
        s = ds_train.get(0)
        assert s is not None
        chosen.add(s.caption_tokens.tobytes())
    assert len(chosen) >= 2  # sampled more than one distinct view


def test_scannet200_loader_remap(mini_dataset):
    """ScanNet200 branch: per-point labels come from the scannet_3d_200 .txt
    sidecar, raw ids outside label_2d are masked to ignore, kept ids remap to
    contiguous; 2D labels read from label_200/ (reference
    data_loader.py:94-111 and the label_200 image dir)."""
    import imageio.v2 as imageio

    root = mini_dataset
    # raw 200-vocabulary ids for a 5-class mini benchmark
    ids200 = [2, 5, 7, 31, 44]
    d200 = root / "scannet_3d_200" / "train"
    d200.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(3)
    n = 4000
    raw = rng.choice(ids200 + [99, 123], size=n).astype(np.float64)
    np.savetxt(d200 / "scene0000_00.txt", raw)

    lbl_dir = root / "scannet_2d" / "scene0000_00" / "label_200"
    lbl_dir.mkdir(exist_ok=True)
    lbl = rng.choice(ids200, size=(480, 640)).astype(np.uint8)
    imageio.imwrite(lbl_dir / "0.png", lbl)

    cfg = ScanNetConfig(
        data_root=str(root / "scannet_3d"),
        data_root_2d=str(root / "scannet_2d"),
        caption_path=str(root / "caption.json"),
        label_2d=ids200,
        base_category=[0, 1, 2],
        novel_category=[3, 4],
        ignore_category=[5, 6],
        voxel_size=0.05,
        split="train",
        loop=1,
        scannet200=True,
    )
    caps = Capacities(max_points=4096, max_voxels=4096, max_targets=24)
    ds = ScanNetViews(cfg, caps, HashTokenizer(), seed=0)
    s = ds.get(0)
    # novel ids {3,4} masked + compacted: base ids end up in 0..2, the
    # ignore sentinel 6 compacts to 6 - len(novel+first_ignore) = 3
    assert set(np.unique(s.labels_3d)) <= {0, 1, 2, 3}
    # 2D labels remapped from raw 200-vocab ids to contiguous 0..4
    assert set(np.unique(s.label_2d)) <= set(range(5)) | {6}


# ---------------------------------------------------------------------------
# train-time grid-alignment jitter (reference run/train.py:481)
# ---------------------------------------------------------------------------


def test_grid_jitter_translation_semantics():
    """A multiple-of-16 translation is an exact no-op for the whole
    hierarchy (all kernel maps identical); the jitter only re-randomizes
    alignment mod the strides. Pins the argument in PARITY.md."""
    import numpy as np

    from xmask3d_tpu.ops.sparse_conv import build_hierarchy

    rng = np.random.RandomState(0)
    coords = np.unique(rng.randint(0, 40, size=(200, 3)), axis=0).astype(
        np.int32
    )
    caps = (256, 128, 64, 32, 16)
    h0 = build_hierarchy(coords, caps)
    h16 = build_hierarchy(coords + np.int32(16), caps)
    for l0, l1 in zip(h0.levels, h16.levels):
        assert int(l0.num) == int(l1.num)
        np.testing.assert_array_equal(np.asarray(l0.kmap3), np.asarray(l1.kmap3))
        np.testing.assert_array_equal(
            np.asarray(l0.coords)[np.asarray(l0.valid)] + 16,
            np.asarray(l1.coords)[np.asarray(l1.valid)],
        )
    np.testing.assert_array_equal(np.asarray(h0.kmap5), np.asarray(h16.kmap5))
    for a, b in zip(h0.down, h16.down):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(h0.up_parent, h16.up_parent):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(h0.up_octant, h16.up_octant):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a non-multiple translation changes the strided pooling partition
    # (that is the augmentation), but never the stride-1 topology
    h1 = build_hierarchy(coords + np.int32(1), caps)
    np.testing.assert_array_equal(np.asarray(h0.kmap5), np.asarray(h1.kmap5))
    np.testing.assert_array_equal(
        np.asarray(h0.levels[0].kmap3), np.asarray(h1.levels[0].kmap3)
    )


def test_collate_grid_jitter_applies_to_train_only_fields():
    """grid_jitter_rng shifts voxel coords by one per-batch constant in
    [0, 16) and touches nothing else in the batch."""
    import numpy as np

    from xmask3d_tpu.data.batching import Capacities, collate_views
    from xmask3d_tpu.data.synthetic import synthetic_view_sample

    caps = Capacities(max_points=256, max_voxels=128, max_targets=8)
    rng = np.random.RandomState(0)
    samples = [
        synthetic_view_sample(
            rng, caps, num_points=400, image_size=(64, 64), mask_shape=(24, 32),
            context_length=16, vocab_size=512,
        )
        for _ in range(2)
    ]
    plain = collate_views(samples, caps, num_base=15, device_hierarchy=True)
    jit = collate_views(
        samples, caps, num_base=15, device_hierarchy=True,
        grid_jitter_rng=np.random.RandomState(7),
    )
    for b in range(2):
        n = int(plain["voxel_num"][b])
        d = jit["voxel_coords"][b][:n] - plain["voxel_coords"][b][:n]
        consts = np.unique(d, axis=0)
        assert consts.shape == (1, 3)
        assert (consts >= 0).all() and (consts < 16).all()
    # same shift for every sample of the batch (reference: one rand(3)/iter)
    np.testing.assert_array_equal(
        jit["voxel_coords"][0][:1] - plain["voxel_coords"][0][:1],
        jit["voxel_coords"][1][:1] - plain["voxel_coords"][1][:1],
    )
    for k in ("voxel_feats", "inds_reconstruct", "labels_3d", "x_label",
              "y_label", "img", "point_valid"):
        np.testing.assert_array_equal(plain[k], jit[k])


def test_val_iter_stays_serial_under_workers(multi_view_dataset, monkeypatch):
    """make_data_iter must NOT prefetch val batches even when workers>0:
    prefetched batches would be built before the trainer sets ds.epoch
    (engine/train.py:260-262), silently breaking the deterministic
    epoch-indexed view iteration pinned above. This was a comment-only
    invariant (engine/train.py:137); pin it behaviorally."""
    from xmask3d_tpu.config import load_config
    from xmask3d_tpu.engine.train import make_data_iter
    import xmask3d_tpu.data.prefetch as prefetch_mod

    root = multi_view_dataset
    cfg = load_config(
        "configs/scannet/xmask3d_scannet_B15N4.yaml",
        [
            "data_root", str(root / "scannet_3d"),
            "data_root_2d", str(root / "scannet_2d"),
            "caption_path", str(root / "caption.json"),
            "workers", "2", "batch_size", "1", "loop", "1",
        ],
    )
    caps = Capacities(max_points=4096, max_voxels=4096, max_targets=8)

    prefetch_calls = []
    real = prefetch_mod.parallel_map_iterator

    def prefetch_spy(fn, args_iter, workers):
        prefetch_calls.append(workers)
        return real(fn, args_iter, workers)

    monkeypatch.setattr(prefetch_mod, "parallel_map_iterator", prefetch_spy)

    it, n, ds = make_data_iter(
        cfg, caps, synthetic=False, tiny=True, split="val",
        allow_hash_tokenizer=True,
    )
    assert ds is not None and n == 1
    assert prefetch_calls == []  # structural: val never routed to prefetch

    # behavioral: the epoch set AFTER iterator creation governs the very
    # next batch (a prefetching iterator would have built it already)
    attempts = []
    orig = ds._load_view

    def view_spy(scene_name, img_dir, locs):
        attempts.append(int(os.path.basename(img_dir)[:-4]))
        return orig(scene_name, img_dir, locs)

    ds._load_view = view_spy
    ds.epoch = 2
    next(it)
    assert attempts == [2]  # built lazily with the freshly-set epoch
    attempts.clear()
    ds.epoch = 0
    next(it)
    assert attempts == [0]

    # the train split, by contrast, DOES use the worker pool — the
    # invariant is the val/train asymmetry, not prefetch-off
    make_data_iter(
        cfg, caps, synthetic=False, tiny=True, split="train",
        allow_hash_tokenizer=True,
    )
    assert prefetch_calls == [2]
