"""Exact per-bin row sums without per-row scatter cost.

XLA TPU scatter-add charges ~75 ns per update ROW regardless of
conflicts or sortedness (DESIGN.md 7a scatter probes) — a [4M, 12] env
texel cotangent scatter costs ~307 ms and dominates hdri-fwd-bwd.  This
module reduces duplicate rows BEFORE scattering:

    sort (id, row-index) pairs           (2-operand lax.sort)
    one [R, C] row gather                (per-LOOKUP latency, ~6 ns/row)
    SEGMENTED Hillis-Steele sum scan     (flat ceil(log2 R)-step graph,
                                          per-COLUMN [R] arrays: no
                                          C -> 128 lane padding in the
                                          hot loop, CLAUDE rule 1)
    per-bin segment-end positions        (scalar bincount + int cumsum)
    one [n_bins, C] gather               (one lookup per bin)

Two designs were rejected on measurement:
  * global f32 cumsum + prefix differencing (round 4, DESIGN.md 7a):
    ULP(global running total) >> small segment sums lost ~0.7%
    relative.  The SEGMENTED scan resets at boundaries, so each
    segment's sum is built only from its own elements — no
    cancellation, f32-exact (CPU f64-oracle check at full 4M scale:
    max abs err 1.7e-6).
  * jax.lax.associative_scan (first round-5 cut): its recursive
    odd/even lowering took >25 min to compile through this machine's
    remote XLA helper at 4M rows; the flat Hillis-Steele graph
    compiles in ~15 s and runs no slower.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rows_segment_sum(ids, rows, n_bins: int):
    """Per-bin sums of ``rows`` [R, C] grouped by integer ``ids`` [R].

    ids: int32 in [0, n_bins); rows with id >= n_bins are dropped.
    Returns [n_bins, C] with out[b] = sum of rows[r] where ids[r] == b.
    Equivalent to ``zeros.at[ids].add(rows)`` (with out-of-range drop
    semantics) but pays per-UNIQUE-bin scatter cost instead of per-row.
    Prefer :func:`cols_segment_sum` when the columns already exist as
    separate [R] arrays (hot paths are component-SoA, CLAUDE rule 1).
    """
    return cols_segment_sum(
        ids, [rows[:, j] for j in range(rows.shape[1])], n_bins)


def cols_segment_sum(ids, col_list, n_bins: int):
    """Column-SoA variant of :func:`rows_segment_sum`: per-bin sums of
    C separate [R] value columns, returned as [n_bins, C]."""
    # Values ride the sort as extra operands: measured 2-op 31 ms /
    # 6-op 39 ms (~2 ms per operand) vs sort + [R,12] row gather at
    # 122 ms — multi-operand lax.sort replaces the gather outright.
    sorted_ops = jax.lax.sort(
        (ids,) + tuple(col_list), num_keys=1)
    return _scan_place(sorted_ops[0], list(sorted_ops[1:]), n_bins)


def cols_segment_sum_factored(ids, carry_cols, expand, n_bins: int):
    """Like :func:`cols_segment_sum` but sorts only a NARROW carry and
    expands it to the scanned value columns AFTER the sort (sort cost
    ~2 ms per operand at 4M): e.g. the env texel cotangent's 12
    product columns (4 bilinear weights x 3 channels) ride as 5
    primitives.  ``expand(*sorted_carry) -> list of value columns``
    must be elementwise (permutation-equivariant)."""
    sorted_ops = jax.lax.sort((ids,) + tuple(carry_cols), num_keys=1)
    return _scan_place(sorted_ops[0], list(expand(*sorted_ops[1:])),
                       n_bins)


def _scan_place(sid, cols, n_bins: int):
    r = sid.shape[0]
    c = len(cols)
    # Segmented inclusive Hillis-Steele scan: at step s,
    # v[i] += v[i-s] unless a segment boundary lies in (i-s, i]
    # (tracked by the OR-scanned flag) — a set flag stops earlier
    # values from flowing across the boundary.
    f = jnp.concatenate(
        [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    s = 1
    while s < r:
        fp = jnp.concatenate([jnp.ones((s,), bool), f[:-s]])
        for j in range(c):
            vp = jnp.concatenate(
                [jnp.zeros((s,), cols[j].dtype), cols[j][:-s]])
            cols[j] = cols[j] + jnp.where(f, 0.0, vp)
        f = f | fp
        s *= 2

    # Per-bin segment END position in the sorted order: bin b ends at
    # cumsum(counts)[b] - 1.  bincount is a SCALAR scatter (~64 ms at
    # 4M — the one remaining per-row cost, 5x cheaper than row scatter).
    counts = jnp.zeros((n_bins + 1,), jnp.int32).at[
        jnp.minimum(sid, n_bins)].add(1)
    ends = jnp.cumsum(counts[:-1]) - 1
    endsc = jnp.maximum(ends, 0)
    out = jnp.stack([col[endsc] for col in cols], axis=-1)
    return jnp.where((counts[:-1] > 0)[:, None], out, 0.0)
