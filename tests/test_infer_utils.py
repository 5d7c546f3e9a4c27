import numpy as np

from xmask3d_tpu.engine.infer import (
    SceneVoter,
    evaluate_scene_predictions,
    kdtree_fill,
    summarize_iou,
)


def test_kdtree_fill():
    coords = np.array([[0, 0, 0], [1, 0, 0], [10, 0, 0]], float)
    values = np.array([7, 8, 0])
    known = np.array([True, True, False])
    out = kdtree_fill(coords, values, known)
    assert out[2] == 8  # nearest known neighbor
    np.testing.assert_array_equal(out[:2], [7, 8])


def test_scene_voter():
    v = SceneVoter(num_points=5, num_classes=3)
    v.add_view(np.array([0, 1, 2]), np.array([0, 1, 2]))
    v.add_view(np.array([0, 1]), np.array([0, 2]))
    v.add_view(np.array([1]), np.array([2]))
    coords = np.arange(15, dtype=float).reshape(5, 3)
    pred = v.finalize(coords)
    assert pred[0] == 0
    assert pred[1] == 2
    assert pred[2] == 2
    # unseen points 3, 4 inherit nearest seen neighbor (point 2)
    assert pred[3] == pred[2] and pred[4] == pred[2]


def test_iou_summary():
    pred = np.array([0, 0, 1, 1, 2, 2])
    gt = np.array([0, 1, 1, 1, 2, 255])
    acc = evaluate_scene_predictions(pred, gt, 3, [0, 1], [2], ignore=(255,))
    s = summarize_iou(acc, base_category=[0, 1], novel_category=[2])
    # class0: inter 1 union 2; class1: inter 2 union 3; class2: inter 1 union 1
    assert abs(s["mIoU_base"] - (0.5 + 2 / 3) / 2) < 1e-6
    assert abs(s["mIoU_novel"] - 1.0) < 1e-6
    assert 0 < s["hIoU"] <= 1


def test_per_view_fill_changes_pred_2d():
    """Per-view nearest-covered fill (reference infer.py:527-548): an
    uncovered point must inherit its nearest covered neighbor's 2D feature
    and therefore its 2D prediction."""
    import jax.numpy as jnp

    from xmask3d_tpu.engine.infer import fill_and_route_2d, nearest_covered_match

    coords = np.array(
        [[0, 0, 0], [10, 0, 0], [9.5, 0, 0], [0.5, 0, 0]], np.float32
    )
    covered = np.array([True, True, False, False])
    valid = np.ones(4, bool)
    match = nearest_covered_match(coords, covered, valid)
    np.testing.assert_array_equal(match, [0, 1, 1, 0])

    # covered point 0 -> class 0, covered point 1 -> class 1
    feat = np.zeros((1, 4, 2), np.float32)
    feat[0, 0] = [1, 0]
    feat[0, 1] = [0, 1]
    text = jnp.asarray(np.eye(2, dtype=np.float32))
    binary_pred = jnp.ones((1, 4), jnp.float32)
    pred = fill_and_route_2d(
        jnp.asarray(feat), jnp.asarray(match)[None], binary_pred, text,
        jnp.asarray(100.0), base_category=(0, 1), novel_category=(),
    )
    np.testing.assert_array_equal(np.asarray(pred)[0], [0, 1, 1, 0])

    # without the fill (identity match) the uncovered points' zero features
    # would argmax to class 0 uniformly
    ident = jnp.arange(4, dtype=jnp.int32)[None]
    pred_nofill = fill_and_route_2d(
        jnp.asarray(feat), ident, binary_pred, text, jnp.asarray(100.0),
        base_category=(0, 1), novel_category=(),
    )
    assert np.asarray(pred_nofill)[0, 2] == 0  # fill changed this one


def test_device_vote_add_matches_host_voter():
    import jax.numpy as jnp

    from xmask3d_tpu.engine.infer import SceneVoter, device_vote_add

    rng = np.random.RandomState(0)
    P, C = 50, 7
    host = SceneVoter(P, C)
    votes = jnp.zeros((P, C), jnp.int32)
    counter = jnp.zeros((P,), jnp.int32)
    for _ in range(4):
        ids = rng.randint(0, P, size=30)
        # host voter indexes with unique ids per view (reference semantics:
        # mask_2d selects each visible point once per view)
        ids = np.unique(ids)
        preds = rng.randint(0, C, size=len(ids))
        valid = rng.rand(len(ids)) > 0.2
        host.add_view(ids[valid], preds[valid])
        votes, counter = device_vote_add(
            votes, counter, jnp.asarray(ids), jnp.asarray(preds), jnp.asarray(valid)
        )
    np.testing.assert_array_equal(np.asarray(votes), host.votes)
    np.testing.assert_array_equal(np.asarray(counter), host.counter)


def test_cast_params_bf16_touches_only_fp32_params():
    import jax.numpy as jnp

    from xmask3d_tpu.engine.infer_cli import cast_params_bf16

    variables = {
        "params": {
            "w": jnp.ones((4, 4), jnp.float32),
            "idx": jnp.zeros((3,), jnp.int32),
            "half": jnp.ones((2,), jnp.bfloat16),
        },
        "batch_stats": {"mean": jnp.zeros((4,), jnp.float32)},
    }
    out = cast_params_bf16(variables)
    assert out["params"]["w"].dtype == jnp.bfloat16
    assert out["params"]["idx"].dtype == jnp.int32
    assert out["params"]["half"].dtype == jnp.bfloat16
    # BN running stats stay fp32
    assert out["batch_stats"]["mean"].dtype == jnp.float32
    # original untouched
    assert variables["params"]["w"].dtype == jnp.float32


def test_view_scene_ids_uses_mask_not_prefix():
    """ADVICE r3 / round-4 review: pv has INTERIOR holes (voxel overflow
    clears rows in place, batching.py `pv &= ir < v`); selection must use
    the mask, never a prefix count — and enforce scene validity if given."""
    import numpy as np

    from xmask3d_tpu.engine.infer import view_scene_ids

    visible = np.zeros(10, bool)
    visible[[1, 3, 4, 7, 9]] = True  # 5 visible scene points
    pv = np.asarray([True, False, True, True, False])  # hole at rows 1, 4
    rows, sids, keep = view_scene_ids(visible, pv)
    np.testing.assert_array_equal(rows, [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(sids, [1, 3, 4, 7, 9])
    np.testing.assert_array_equal(keep, pv)  # NOT a prefix of pv.sum()=3

    # capacity cut: more visible points than rows
    pv2 = np.asarray([True, True, True])
    rows2, sids2, keep2 = view_scene_ids(visible, pv2)
    np.testing.assert_array_equal(sids2, [1, 3, 4])

    # scene validity: dropped scene points and out-of-range ids masked
    scene_pv = np.asarray([True, True, True, False, True, True, True, True])
    rows3, sids3, keep3 = view_scene_ids(visible, pv, scene_pv)
    # row 1 -> scene 3 dropped; row 4 -> scene 9 out of range; row 1/4 also
    # pv-invalid here, so flip pv to isolate the scene mask
    pv_all = np.ones(5, bool)
    _, _, keep4 = view_scene_ids(visible, pv_all, scene_pv)
    np.testing.assert_array_equal(keep4, [True, False, True, True, False])


def test_all_reduce_acc_single_process_identity():
    """Cross-process IoU meter reduction (reference dist.all_reduce,
    run/infer.py:648-652): on one process, allgather+sum is the identity;
    transport is int32-exact for integral histogram counts above 2^24."""
    import numpy as np

    from xmask3d_tpu.engine.infer_cli import all_reduce_acc

    acc = {
        "inter": np.asarray([17000000.0, 3.0, 0.0]),  # > 2^24: fp32 would round
        "union": np.asarray([17000001.0, 5.0, 2.0]),
        "target": np.asarray([1.0, 2.0, 3.0]),
    }
    out = all_reduce_acc(acc)
    for k in acc:
        np.testing.assert_array_equal(out[k], acc[k])
        assert out[k].dtype == np.float64
