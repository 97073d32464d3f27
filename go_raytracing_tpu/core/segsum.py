"""Exact per-bin row sums without per-row scatter cost.

XLA TPU scatter-add charges ~75 ns per update ROW regardless of
conflicts or sortedness (DESIGN.md 7a scatter probes) — a [4M, 12] env
texel cotangent scatter costs ~307 ms and dominates hdri-fwd-bwd.  This
module reduces duplicate rows BEFORE scattering:

    sort rows by bin id                  (~43 ms for 4M keys)
    SEGMENTED pairwise sum scan          (resets at segment boundaries)
    per-bin segment-end positions        (scalar bincount + int cumsum)
    one [n_bins, C] gather               (one lookup per bin)

The round-4 attempt at this (global f32 cumsum + prefix differencing)
was CLOSED for accuracy: ULP(global running total) >> small segment
sums lost ~0.7% relative (DESIGN.md 7a).  The segmented scan has no
such term — each segment's sum is built only from its own elements in a
pairwise tree, so relative error is ~ULP * log2(segment length), and
equivalence to the scatter-add oracle holds at f32 tolerance
(tests/test_core.py::test_rows_segment_sum_*).
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
    """
    r = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    srow = rows[order]
    flag = jnp.concatenate(
        [jnp.ones((1,), bool), sid[1:] != sid[:-1]])

    # Segmented inclusive sum scan: (v1,f1) op (v2,f2) =
    # (v2 + v1 * !f2, f1 | f2) — associative; a set flag stops earlier
    # values from flowing across the boundary.
    def op(a, b):
        av, af = a
        bv, bf = b
        return bv + jnp.where(bf[..., None], 0.0, av), af | bf

    vals, _ = jax.lax.associative_scan(op, (srow, flag), axis=0)

    # Per-bin segment END position in the sorted order: ids < n_bins
    # occupy the first sum(counts) slots, bin b ends at
    # cumsum(counts)[b] - 1.  bincount is a SCALAR scatter (~64 ms at
    # 4M — the one remaining per-row cost, 5x cheaper than row scatter).
    counts = jnp.zeros((n_bins + 1,), jnp.int32).at[
        jnp.minimum(sid, n_bins)].add(1)
    ends = jnp.cumsum(counts[:-1]) - 1
    out = vals[jnp.maximum(ends, 0)]
    return jnp.where((counts[:-1] > 0)[:, None], out, 0.0)
