from xmask3d_tpu.config import load_config, merge_overrides


def test_load_benchmark_config():
    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    assert cfg.classes == 15
    assert cfg.num_queries == 50
    assert cfg.arch_3d == "MinkUNet34C"
    assert cfg.category_split.novel_category == [5, 9, 12, 16]
    assert cfg.loss_weight.loss_binary == 16


def test_overrides_type_coercion():
    cfg = load_config(
        "configs/scannet/xmask3d_scannet_B15N4.yaml",
        overrides=["classes", "19", "voxel_size", "0.05", "arch_3d", "MinkUNet18A"],
    )
    assert cfg.classes == 19
    assert cfg.voxel_size == 0.05
    assert cfg.arch_3d == "MinkUNet18A"


def test_nested_override():
    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    merge_overrides(cfg, ["loss_weight.loss_3d", "8"])
    assert cfg.loss_weight.loss_3d == 8
