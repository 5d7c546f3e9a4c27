"""Scanned scene serving (engine/serve.py): the lax.scan-over-views program
must produce exactly the same vote state as dispatching the views one by
one — same per-view semantics, different dispatch boundary."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.config import load_config
from xmask3d_tpu.data.batching import Capacities
from xmask3d_tpu.data.synthetic import synthetic_batch
from xmask3d_tpu.engine import serve
from xmask3d_tpu.engine.builder import init_model

# compile-heavy: builds/compiles a full tiny model (excluded from make test-fast)
pytestmark = pytest.mark.e2e


def test_scene_scan_matches_per_view_dispatch():
    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    cfg.mask_shape = [24, 32]
    caps = Capacities(max_points=512, max_voxels=256, max_targets=8)
    views = []
    for seed in (0, 1, 2):
        b = synthetic_batch(
            1, caps, seed=seed, num_points=400, image_size=(64, 64),
            mask_shape=(24, 32), context_length=16, vocab_size=512,
        )
        views.append(jax.tree_util.tree_map(jnp.asarray, b))

    model, variables, statics = init_model(cfg, views[0], tiny=True)
    statics = jax.tree_util.tree_map(jnp.asarray, statics)

    infer_step = jax.jit(serve.make_view_body(model, cfg))
    vc = serve.fresh_vote_state(caps.max_points, model.cfg.num_test_classes)
    for b in views:
        vc = infer_step(variables, b, statics, *vc)

    scene_scan = serve.make_scene_scan_step(model, cfg)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *views)
    idxseq = jnp.arange(len(views), dtype=jnp.int32)
    vc2 = scene_scan(
        variables, stacked, idxseq, statics,
        *serve.fresh_vote_state(caps.max_points, model.cfg.num_test_classes),
    )

    np.testing.assert_array_equal(np.asarray(vc[0]), np.asarray(vc2[0]))
    np.testing.assert_array_equal(np.asarray(vc[1]), np.asarray(vc2[1]))
    assert int(np.asarray(vc2[1]).max()) > 0  # votes actually accumulated

    # --- real-scene id plumbing: stack_scene_views -> scan votes land on
    # SCENE rows and equal per-view dispatch with the same ids ---
    from xmask3d_tpu.data.synthetic import synthetic_scene

    scene = synthetic_scene(
        caps, seed=5, num_points=900, num_views=3, num_classes=cfg.classes,
        image_size=(64, 64), mask_shape=(24, 32), context_length=16,
        vocab_size=512,
    )
    stacked_s, idxseq_s, n_pts = serve.stack_scene_views(
        scene, caps, num_base=cfg.classes
    )
    assert n_pts == 900
    assert "vote_point_ids" in stacked_s
    ids_np = np.asarray(stacked_s["vote_point_ids"])
    assert ids_np.max() < n_pts
    # every non-padding id is a visible scene point of its view
    for v, view in enumerate(scene["views"]):
        used = ids_np[v][ids_np[v] >= 0]
        assert np.isin(used, np.where(view["visible"])[0]).all()

    vs = serve.fresh_vote_state(n_pts, model.cfg.num_test_classes)
    vs_scan = scene_scan(variables, stacked_s, idxseq_s, statics, *vs)
    vs_ref = serve.fresh_vote_state(n_pts, model.cfg.num_test_classes)
    for v in range(len(scene["views"])):
        b = jax.tree_util.tree_map(lambda x: x[v], stacked_s)
        vs_ref = infer_step(variables, b, statics, *vs_ref)
    np.testing.assert_array_equal(np.asarray(vs_scan[0]), np.asarray(vs_ref[0]))
    np.testing.assert_array_equal(np.asarray(vs_scan[1]), np.asarray(vs_ref[1]))
    counts = np.asarray(vs_scan[1])
    assert counts.sum() > 0
    # votes only on points visible in >= 1 view
    any_visible = np.zeros(n_pts, bool)
    for view in scene["views"]:
        any_visible |= view["visible"]
    assert (counts[~any_visible] == 0).all()


def test_resolve_vote_ids_identity_and_plumbed():
    pv = jnp.asarray([[True, True, False, True]])
    ids, valid, precomp = serve.resolve_vote_ids({"point_valid": pv})
    np.testing.assert_array_equal(np.asarray(ids), [[0, 1, 2, 3]])
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(pv))
    assert precomp is None

    vp = jnp.asarray([[7, 3, -1, 2]], jnp.int32)
    ids, valid, _ = serve.resolve_vote_ids(
        {"point_valid": pv, "vote_point_ids": vp}
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(vp))
    # padding rows (-1) stay ONLY as invalid via device_vote_add's sentinel;
    # without scene3d the validity is the batch's point_valid untouched
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(pv))


def test_resolve_vote_ids_masks_scene_invalid_rows():
    # ADVICE r3 medium: ids beyond the scene table or pointing at dropped
    # scene points must be voted as invalid, and gathers must stay in range
    pv = jnp.asarray([[True, True, True, True, True]])
    vp = jnp.asarray([[0, 2, 9, -1, 3]], jnp.int32)  # 9 out of range (rows=4)
    scene3d = {
        "imp_condition": jnp.zeros((1, 8)),
        "pred_3d": jnp.arange(4 * 2, dtype=jnp.float32).reshape(1, 4, 2),
        "binary_scores": jnp.asarray([[0.0, 1.0, 2.0, 3.0]]),
        "point_valid": jnp.asarray([[True, True, False, True]]),  # 2 dropped
    }
    ids, valid, precomp = serve.resolve_vote_ids(
        {"point_valid": pv, "vote_point_ids": vp}, scene3d
    )
    # row 0 -> scene 0 ok; row 1 -> scene 2 DROPPED; row 2 -> out of range;
    # row 3 -> padding; row 4 -> scene 3 ok
    np.testing.assert_array_equal(
        np.asarray(valid), [[True, False, False, False, True]]
    )
    # gathers clamped in range: row 2 gathered scene row 3, row 3 row 0
    np.testing.assert_array_equal(
        np.asarray(precomp["binary_scores"]), [[0.0, 2.0, 3.0, 0.0, 3.0]]
    )
    got = np.asarray(precomp["pred_3d"])
    assert got.shape == (1, 5, 2)
    np.testing.assert_array_equal(got[0, 2], [6.0, 7.0])


def test_vote_with_plumbed_ids_lands_on_scene_rows():
    # multi-view voting with per-view scene ids through device_vote_add:
    # votes must land on SCENE rows, not view-local rows (ADVICE r3 medium)
    from xmask3d_tpu.engine.infer import device_vote_add

    votes = jnp.zeros((6, 3), jnp.int32)
    counter = jnp.zeros((6,), jnp.int32)
    # view A rows -> scene points 4,1; view B rows -> scene points 1,5
    for vp, preds in (([4, 1], [0, 2]), ([1, 5], [2, 1])):
        ids, valid, _ = serve.resolve_vote_ids(
            {
                "point_valid": jnp.asarray([[True, True]]),
                "vote_point_ids": jnp.asarray([vp], jnp.int32),
            }
        )
        votes, counter = device_vote_add(
            votes, counter, ids.reshape(-1),
            jnp.asarray(preds, jnp.int32), valid.reshape(-1),
        )
    np.testing.assert_array_equal(np.asarray(counter), [0, 2, 0, 0, 1, 1])
    assert int(np.asarray(votes)[1, 2]) == 2  # scene point 1 voted class 2 twice
    assert int(np.asarray(votes)[4, 0]) == 1
    assert int(np.asarray(votes)[5, 1]) == 1


def test_one_hot_vote_matches_scatter_vote():
    # the identity-ids fast path in make_view_body must equal
    # device_vote_add's scatter semantics (negative/invalid dropped)
    from xmask3d_tpu.engine.infer import device_vote_add

    rng = np.random.RandomState(0)
    p, c = 64, 7
    votes = jnp.zeros((p, c), jnp.int32)
    counter = jnp.zeros((p,), jnp.int32)
    pred = jnp.asarray(rng.randint(0, c, size=(p,)), jnp.int32)
    valid = jnp.asarray(rng.rand(p) > 0.3)

    ids = jnp.arange(p, dtype=jnp.int32)
    v_ref, c_ref = device_vote_add(votes, counter, ids, pred, valid)

    upd = valid.astype(jnp.int32)
    onehot = jax.nn.one_hot(pred, c, dtype=jnp.int32)
    v_new = votes + onehot * upd[:, None]
    c_new = counter + upd

    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_new))
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_new))
