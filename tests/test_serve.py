"""Scanned scene serving (engine/serve.py): the lax.scan-over-views program
must produce exactly the same vote state as dispatching the views one by
one — same per-view semantics, different dispatch boundary."""

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.config import load_config
from xmask3d_tpu.data.batching import Capacities
from xmask3d_tpu.data.synthetic import synthetic_batch
from xmask3d_tpu.engine import serve
from xmask3d_tpu.engine.builder import init_model


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
