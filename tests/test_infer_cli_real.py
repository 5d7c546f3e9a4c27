"""Real-data infer CLI end-to-end on the miniature on-disk dataset.

Drives main() through the REAL branch (ScanNetSceneViews, per-view
protocol, voting, KD-tree fill, hIoU meters) with the tiny model — the
asset-free integration test for the path that previously could only run
with staged ScanNet data (a NameError in exactly this branch survived one
round-4 refactor because no test reached it)."""

import numpy as np
import pytest

from mini_scannet import BASE, LABEL_2D, NOVEL, build_mini_scannet

# compile-heavy: builds/compiles a full tiny model (excluded from make test-fast)
pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    return build_mini_scannet(tmp_path_factory.mktemp("scannet_cli"), n_views=2)


def _argv(root, extra=()):
    return [
        "--config", "configs/scannet/xmask3d_scannet_B15N4.yaml",
        "--tiny", "--allow_hash_tokenizer",
        *extra,
        "data_root", str(root / "scannet_3d"),
        "data_root_2d", str(root / "scannet_2d"),
        "caption_path", str(root / "caption.json"),
        "max_points", "4096", "max_voxels", "4096", "max_targets", "8",
        "mask_shape", "[24,32]",
    ]


def test_infer_cli_real_data_per_view(mini_root):
    from xmask3d_tpu.engine.infer_cli import main

    summary = main(_argv(mini_root))
    assert summary is not None
    for k in ("hIoU", "mIoU", "hIoU_2d", "hIoU_3d", "scenes_per_sec"):
        assert k in summary
        assert np.isfinite(summary[k])


def test_infer_cli_real_data_scene_reuse(mini_root):
    from xmask3d_tpu.engine.infer_cli import main

    summary = main(_argv(mini_root, extra=("--scene_reuse",)))
    assert summary is not None
    assert np.isfinite(summary["hIoU"])
