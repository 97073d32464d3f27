"""TPU probe: rows_segment_sum compile + run cost at 4M rows, vs (a)
the raw scatter-add and (b) a flat Hillis-Steele segmented scan
(associative_scan's recursive odd/even lowering is the compile-time
suspect through the remote helper)."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

R = 4 * 1024 * 1024 - 128 * 1024  # non-power-of-2, chunk-like
T = 512 * 1024

rng = np.random.default_rng(0)
ids_np = rng.integers(0, T, size=R).astype(np.int32)
rows_np = rng.normal(size=(R, 12)).astype(np.float32)
ids = jnp.asarray(ids_np)
rows = jnp.asarray(rows_np)


def timed(name, fn, *a):
    t0 = time.perf_counter()
    out = jax.jit(lambda *aa: jnp.sum(fn(*aa))).lower(*a).compile()
    tc = time.perf_counter() - t0
    # ONE device->host scalar fetch per run forces materialization
    # (block_until_ready can return early through the tunnel, rule 12)
    s = float(out(*a))
    t0 = time.perf_counter()
    for _ in range(3):
        s = float(out(*a))
    tr = (time.perf_counter() - t0) / 3
    print(f"{name:18s}: compile {tc:7.1f}s  run {tr*1e3:8.1f} ms  "
          f"checksum {s:.6e}", flush=True)
    return jax.jit(fn)(*a)


def scatter(ids, rows):
    return jnp.zeros((T, 12), jnp.float32).at[ids].add(
        rows, mode="drop")


def segsum_hs(ids, rows):
    """Hillis-Steele segmented scan variant: flat 22-step graph."""
    order = jnp.argsort(ids)
    sid = ids[order]
    v = rows[order]
    f = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    s = 1
    while s < v.shape[0]:
        vp = jnp.concatenate([jnp.zeros((s, v.shape[1]), v.dtype), v[:-s]])
        fp = jnp.concatenate([jnp.ones((s,), bool), f[:-s]])
        v = v + jnp.where(f[:, None], 0.0, vp)
        f = f | fp
        s *= 2
    counts = jnp.zeros((T + 1,), jnp.int32).at[jnp.minimum(sid, T)].add(1)
    ends = jnp.cumsum(counts[:-1]) - 1
    out = v[jnp.maximum(ends, 0)]
    return jnp.where((counts[:-1] > 0)[:, None], out, 0.0)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "scatter"):
        want = timed("scatter", scatter, ids, rows)
    if which in ("all", "hs"):
        got = timed("hillis-steele", segsum_hs, ids, rows)
    if which == "all":
        err = float(jnp.max(jnp.abs(got - want)) /
                    (jnp.max(jnp.abs(want)) + 1e-9))
        print(f"rel err hs vs scatter: {err:.2e}")
    if which in ("all", "assoc"):
        from go_raytracing_tpu.core.segsum import rows_segment_sum
        got2 = timed("assoc-scan", lambda i, r: rows_segment_sum(i, r, T),
                     ids, rows)
