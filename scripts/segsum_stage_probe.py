"""TPU stage profile of the sorted segment-sum pipeline (hdri env
scatter): incremental variants isolate sort / gather / scan / place
costs at the real chunk scale.  DESIGN 7a follow-up."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

R = 4 * 1024 * 1024 - 128 * 1024
T = 512 * 1024
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, T, size=R).astype(np.int32))
rows = jnp.asarray(rng.normal(size=(R, 12)).astype(np.float32))


def timed(name, fn):
    out = jax.jit(lambda i, r: jnp.sum(fn(i, r))).lower(ids, rows).compile()
    s = float(out(ids, rows))
    t0 = time.perf_counter()
    for _ in range(5):
        s = float(out(ids, rows))
    tr = (time.perf_counter() - t0) / 5
    print(f"{name:26s}: {tr*1e3:8.1f} ms  (checksum {s:.4e})", flush=True)


def sort_only(i, r):
    sid, order = jax.lax.sort((i, jnp.arange(R, dtype=jnp.int32)),
                              num_keys=1)
    return sid + order


def sort_gather(i, r):
    sid, order = jax.lax.sort((i, jnp.arange(R, dtype=jnp.int32)),
                              num_keys=1)
    return r[order]


def sort_gather_scan(i, r):
    sid, order = jax.lax.sort((i, jnp.arange(R, dtype=jnp.int32)),
                              num_keys=1)
    srows = r[order]
    cols = [srows[:, j] for j in range(12)]
    f = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    s = 1
    while s < R:
        fp = jnp.concatenate([jnp.ones((s,), bool), f[:-s]])
        for j in range(12):
            vp = jnp.concatenate(
                [jnp.zeros((s,), cols[j].dtype), cols[j][:-s]])
            cols[j] = cols[j] + jnp.where(f, 0.0, vp)
        f = f | fp
        s *= 2
    return sum(jnp.sum(c) for c in cols)


def bincount_place(i, r):
    counts = jnp.zeros((T + 1,), jnp.int32).at[jnp.minimum(i, T)].add(1)
    ends = jnp.cumsum(counts[:-1]) - 1
    return jnp.stack([r[:T, j][jnp.maximum(ends, 0)] for j in range(12)],
                     axis=-1)


def full(i, r):
    from go_raytracing_tpu.core.segsum import rows_segment_sum
    return rows_segment_sum(i, r, T)


if __name__ == "__main__":
    timed("sort(id,iota)", sort_only)
    timed("+ row gather", sort_gather)
    timed("+ 22-step SoA scan", sort_gather_scan)
    timed("bincount+ends+12 gathers", bincount_place)
    timed("full rows_segment_sum", full)
