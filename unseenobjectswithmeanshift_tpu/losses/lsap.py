"""Linear sum assignment (rectangular Hungarian) ON DEVICE, jit-compatible.

The reference hops to the CPU for scipy.optimize.linear_sum_assignment
(ref: modeling/matcher.py:149-151). The axon TPU runtime does not support host
callbacks, and a host hop would split the train step anyway - so this is a
shortest-augmenting-path (Jonker-Volgenant) solver in pure lax ops, the same
algorithm scipy implements (Crouse 2016). Matrices here are tiny
([num_queries x num_gt] = [100 x <=24]); each augmenting path is O(Q) vector
steps over fixed shapes.

Orientation: cost [R, C] with R <= C (rows = ground truths, cols = queries);
returns col4row [R] int32 - the assigned column for every row.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INF = float("inf")   # plain Python float: a jnp scalar here would initialize
# the device backend at import time (and hang imports when no device is
# reachable); jnp ops promote it to the computation dtype


def _augmenting_path(cost, u, v, row4col, cur_row, n_rows_valid):
    """Find the shortest augmenting path from cur_row.

    Returns (sink, minVal, SR [R] bool, SC [C] bool, SP [C], path [C])."""
    R, C = cost.shape

    def cond(state):
        sink, *_ = state
        return sink < 0

    def body(state):
        sink, minVal, i, SR, SC, SP, path = state
        SR = SR.at[i].set(True)
        r = minVal + cost[i] - u[i] - v            # [C]
        better = (~SC) & (r < SP)
        SP = jnp.where(better, r, SP)
        path = jnp.where(better, i, path)

        masked_SP = jnp.where(SC, INF, SP)
        lowest = jnp.min(masked_SP)
        cand = (~SC) & (masked_SP == lowest)
        unassigned_cand = cand & (row4col < 0)
        j = jnp.where(jnp.any(unassigned_cand),
                      jnp.argmax(unassigned_cand), jnp.argmax(cand)).astype(jnp.int32)
        SC = SC.at[j].set(True)
        new_sink = jnp.where(row4col[j] < 0, j, -1)
        new_i = jnp.where(row4col[j] < 0, i, row4col[j])
        return new_sink, lowest, new_i, SR, SC, SP, path

    init = (jnp.int32(-1), jnp.float32(0.0), cur_row,
            jnp.zeros((R,), bool), jnp.zeros((C,), bool),
            jnp.full((C,), INF), jnp.full((C,), -1, jnp.int32))
    sink, minVal, _, SR, SC, SP, path = jax.lax.while_loop(cond, body, init)
    return sink, minVal, SR, SC, SP, path


@partial(jax.jit, static_argnames=())
def solve_lsap(cost, n_valid_rows):
    """cost: [R, C] float32 with R <= C; n_valid_rows: traced int - only the first
    n rows are assigned. Returns col4row [R] int32 (-1 for invalid rows)."""
    R, C = cost.shape
    cost = cost.astype(jnp.float32)

    def assign_row(cur_row, carry):
        u, v, row4col, col4row = carry
        sink, minVal, SR, SC, SP, path = _augmenting_path(
            cost, u, v, row4col, cur_row, n_valid_rows)

        # dual update (scipy rectangular_lsap semantics)
        u = u.at[cur_row].add(minVal)
        other = SR & (jnp.arange(R) != cur_row)
        sp_at_assigned = SP[jnp.clip(col4row, 0, C - 1)]          # [R]
        u = jnp.where(other, u + minVal - sp_at_assigned, u)
        v = jnp.where(SC, v + SP - minVal, v)

        # augment along the alternating path
        def aug_cond(s):
            _, _, j, done = s
            return ~done

        def aug_body(s):
            row4col_, col4row_, j, _ = s
            i = path[j]
            row4col_ = row4col_.at[j].set(i)
            prev = col4row_[i]
            col4row_ = col4row_.at[i].set(j)
            return row4col_, col4row_, prev, i == cur_row

        row4col, col4row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (row4col, col4row, sink, False))
        return u, v, row4col, col4row

    def step(cur_row, carry):
        return jax.lax.cond(cur_row < n_valid_rows,
                            lambda c: assign_row(cur_row, c), lambda c: c, carry)

    u = jnp.zeros((R,), jnp.float32)
    v = jnp.zeros((C,), jnp.float32)
    row4col = jnp.full((C,), -1, jnp.int32)
    col4row = jnp.full((R,), -1, jnp.int32)
    u, v, row4col, col4row = jax.lax.fori_loop(0, R, step, (u, v, row4col, col4row))
    valid = jnp.arange(R) < n_valid_rows
    return jnp.where(valid, col4row, -1)
