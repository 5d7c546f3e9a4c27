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
