import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment as scipy_lsa

from xmask3d_tpu.ops.hungarian import linear_sum_assignment


def test_matches_scipy_optimal_cost():
    rng = np.random.RandomState(0)
    for trial in range(30):
        t = rng.randint(1, 25)
        q = rng.randint(t, 60)
        cost = rng.randn(t, q).astype(np.float32) * 10
        ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
        # valid permutation
        assert len(set(ours.tolist())) == t
        ri, ci = scipy_lsa(cost)
        np.testing.assert_allclose(
            cost[np.arange(t), ours].sum(), cost[ri, ci].sum(), rtol=1e-5, atol=1e-4
        )


def test_padded_rows_uniform_cost():
    cost = np.array(
        [[1.0, 9.0, 9.0], [9.0, 1.0, 9.0], [5.0, 5.0, 5.0]], np.float32
    )
    ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert ours[0] == 0 and ours[1] == 1 and ours[2] == 2


def test_nan_cost_terminates_with_valid_permutation():
    """NaN costs used to spin the Dijkstra while_loop forever (every
    comparison False -> no sink). On TPU that presented as the runtime
    watchdog killing the worker mid-train-step the moment logits overflowed
    to NaN. The solver must sanitize and terminate with SOME valid
    assignment."""
    rng = np.random.RandomState(1)
    for t, q in ((3, 5), (24, 50), (50, 50)):
        cost = rng.randn(t, q).astype(np.float32)
        cost[rng.rand(t, q) < 0.5] = np.nan
        ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
        assert len(set(ours.tolist())) == t
        assert (0 <= ours).all() and (ours < q).all()
    # all-NaN and +/-inf matrices as well
    for fill in (np.nan, np.inf, -np.inf):
        cost = np.full((4, 6), fill, np.float32)
        ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
        assert len(set(ours.tolist())) == 4
