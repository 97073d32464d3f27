"""TPU exactness isolation: scatter-add vs core.segsum.rows_segment_sum,
each against a HOST-side float64 oracle at the full 4M/512K scale (the
first TPU probe showed a 6.5e-3 scatter-vs-scan disagreement that does
NOT reproduce on CPU — this pins which side deviates on the chip)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from go_raytracing_tpu.core.segsum import rows_segment_sum

R = 4 * 1024 * 1024 - 128 * 1024
T = 512 * 1024
rng = np.random.default_rng(0)
ids_np = rng.integers(0, T, size=R).astype(np.int32)
rows_np = rng.normal(size=(R, 12)).astype(np.float32)

want = np.zeros((T, 12), np.float64)
np.add.at(want, ids_np, rows_np.astype(np.float64))
wmax = np.abs(want).max()

ids = jnp.asarray(ids_np)
rows = jnp.asarray(rows_np)

for name, fn in (
    ("scatter", lambda i, r: jnp.zeros((T, 12), jnp.float32).at[i].add(r)),
    ("segsum-hs", lambda i, r: rows_segment_sum(i, r, T)),
):
    got = np.asarray(jax.jit(fn)(ids, rows), dtype=np.float64)
    d = np.abs(got - want)
    bad = int((d > 1e-4 * max(wmax, 1.0)).sum())
    i = np.unravel_index(d.argmax(), d.shape)
    print(f"{name:10s}: max abs {d.max():.3e} (rel-to-max {d.max()/wmax:.2e}) "
          f"bad>1e-4: {bad}  worst at bin {i[0]} col {i[1]} "
          f"got {got[i]:.6f} want {want[i]:.6f}", flush=True)
