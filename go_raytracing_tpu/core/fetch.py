"""Per-ray fetches from per-primitive tables without per-element gathers.

TPU gathers are latency-bound at ~8-12 ns per element regardless of table
size (DESIGN.md); a wavefront of 2M rays pays ~16 ms for EVERY gathered
scalar column.  Two cheaper shapes:

- small tables (materials, textures, lights, mesh instances): a
  broadcast-select ladder — n*K pure-VPU selects, ~1 ms at 2M rays,
  bit-exact, and differentiable (gradients flow through the selects back
  to the table).
- large tables (triangle data): ONE [R, K] row gather moves all K
  components per lookup (~18-25 ms total), with integer columns riding
  along bitcast to f32 (bit-exact round trip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LADDER_MAX = 64


def rows_fetch(cols, idx):
    """cols: list of [n] arrays (mixed f32/int dtypes); idx: [R] i32.
    Returns [R]-shaped per-ray values for every column."""
    n = int(cols[0].shape[0])
    if n <= LADDER_MAX:
        outs = []
        for c in cols:
            acc = jnp.broadcast_to(c[0], idx.shape)
            for i in range(1, n):
                acc = jnp.where(idx == i, c[i], acc)
            outs.append(acc)
        return outs
    bc = jax.lax.bitcast_convert_type
    packed = jnp.stack(
        [c if c.dtype == jnp.float32 else bc(c, jnp.float32) for c in cols],
        axis=1,
    )
    g = packed[idx]
    return [
        g[:, k] if c.dtype == jnp.float32 else bc(g[:, k], c.dtype)
        for k, c in enumerate(cols)
    ]
