"""Jit-able optimal assignment (Jonker-Volgenant shortest augmenting path).

Replaces the reference's CPU scipy.optimize.linear_sum_assignment sync inside
the HungarianMatcher (mask2former/modeling/matcher.py:96-156) — a per-step
GPU->CPU round trip in the reference — with an on-device solver. Cost
matrices are tiny (num_queries=50 x max_targets<=~30), so the O(T^2 * Q)
algorithm is negligible next to the model; the win is staying inside one
XLA program (no host sync, pipelineable, vmappable over the batch).

Matches scipy's optimal cost exactly (assignment ties may differ).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


@partial(jax.jit, static_argnames=())
def linear_sum_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment of T rows (targets) to Q columns (queries).

    Args:
      cost: (T, Q) float matrix, T <= Q. Padded rows should carry a constant
        (e.g. large) cost so they absorb arbitrary leftover columns.

    Returns:
      row2col: (T,) int32 — the assigned column for every row.
    """
    t, q = cost.shape
    assert t <= q, "requires num targets <= num queries"
    cost = cost.astype(jnp.float32)
    # Termination guard: with NaN entries every comparison is False, sc
    # stays _INF, no column ever becomes the sink and the Dijkstra loop
    # below spins FOREVER — on TPU that presents as the runtime watchdog
    # killing the worker ("TPU worker process crashed or restarted"), which
    # is exactly what a train step whose logits overflowed to NaN does to
    # the whole program. Sanitize to large finite costs (assignment on such
    # input is arbitrary-but-valid; the training loss is already garbage)
    # and additionally hard-bound both loops.
    cost = jnp.nan_to_num(cost, nan=1e9, posinf=1e9, neginf=-1e9)

    def solve_row(carry, cur_row):
        u, v, row2col, col2row = carry
        # Dijkstra from cur_row over columns
        sc = jnp.full((q,), _INF)  # shortest path cost per column
        pred = jnp.full((q,), -1, jnp.int32)  # predecessor row per column
        remaining = jnp.ones((q,), bool)
        scanned_cols = jnp.zeros((q,), bool)

        def dijkstra_cond(state):
            _, _, _, _, _, sink, _, it = state
            # a free column is always reached within q scans on finite
            # costs; the explicit bound keeps the loop total even if the
            # input defeats the sanitization above
            return (sink < 0) & (it <= q)

        def dijkstra_body(state):
            sc, pred, remaining, scanned_cols, i, sink, min_val, it = state
            red = min_val + cost[i] - u[i] - v  # reduced costs from row i
            better = remaining & (red < sc)
            sc = jnp.where(better, red, sc)
            pred = jnp.where(better, i, pred)
            masked = jnp.where(remaining, sc, _INF)
            j = jnp.argmin(masked)
            min_val = masked[j]
            remaining = remaining.at[j].set(False)
            scanned_cols = scanned_cols.at[j].set(True)
            nxt = col2row[j]
            sink = jnp.where(nxt < 0, j, -1)
            i = jnp.where(nxt < 0, i, nxt)
            return sc, pred, remaining, scanned_cols, i, sink, min_val, it + 1

        sc, pred, remaining, scanned_cols, _, sink, min_val, _ = jax.lax.while_loop(
            dijkstra_cond,
            dijkstra_body,
            (sc, pred, remaining, scanned_cols, cur_row, jnp.int32(-1),
             jnp.float32(0.0), jnp.int32(0)),
        )
        # bound hit without a sink (unreachable on sanitized input): pick
        # any free column so the augmentation below stays well-formed
        sink = jnp.where(sink < 0, jnp.argmin(jnp.where(col2row < 0, 0, 1)), sink)

        # update potentials
        u = u.at[cur_row].add(min_val)
        # rows visited = rows assigned to scanned columns (excluding sink);
        # max-scatter so unscanned entries (-1 -> clipped 0) cannot clobber
        scanned_wo_sink = scanned_cols.at[sink].set(False)
        vr = jnp.where(scanned_wo_sink, col2row, -1)
        visited_rows = (
            jnp.zeros((t,), jnp.int32)
            .at[jnp.clip(vr, 0, t - 1)]
            .max((vr >= 0).astype(jnp.int32))
            .astype(bool)
        )
        row_sc = jnp.where(
            visited_rows,
            sc[jnp.clip(row2col, 0, q - 1)],
            0.0,
        )
        u = jnp.where(visited_rows, u + min_val - row_sc, u)
        v = jnp.where(scanned_wo_sink, v - (min_val - sc), v)

        # augment along predecessor path, ending at sink
        def aug_cond(state):
            _, _, j, done, it = state
            # the augmenting path alternates rows/columns, length <= t
            return (~done) & (it <= t)

        def aug_body(state):
            row2col, col2row, j, _, it = state
            i = pred[j]
            col2row = col2row.at[j].set(i)
            prev_j = row2col[i]
            row2col = row2col.at[i].set(j)
            done = i == cur_row
            return row2col, col2row, prev_j, done, it + 1

        row2col, col2row, _, _, _ = jax.lax.while_loop(
            aug_cond, aug_body,
            (row2col, col2row, sink, jnp.bool_(False), jnp.int32(0)),
        )
        return (u, v, row2col, col2row), None

    u0 = jnp.zeros((t,))
    v0 = jnp.zeros((q,))
    row2col0 = jnp.full((t,), -1, jnp.int32)
    col2row0 = jnp.full((q,), -1, jnp.int32)
    (_, _, row2col, _), _ = jax.lax.scan(
        solve_row, (u0, v0, row2col0, col2row0), jnp.arange(t, dtype=jnp.int32)
    )
    return row2col
