"""Microbenchmark: cost per tile sweep in the stream kernel's phase B.

Runs a stripped kernel that does exactly N sweeps per block, with
variants toggling the suspected cost drivers:

  full      dynamic roll extraction + dynamic tri tile + while bitscan
  noroll    rays fixed (no pltpu.roll) - measures roll cost
  notri     fixed tile id (no dynamic tri_ref index)
  fori      dense fori loop instead of while bitscan
  sweeponly fori + noroll + fixed tid: pure MT vector cost

Usage: python scripts/stream_micro.py [--sweeps 512] [--blocks 512]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP, LANES, ROWS, TILE = 8, 128, 16, 128
BIG = np.float32(3.0e38)


def make_kernel(n_sweeps, *, roll, dyn_tri, use_while):
    def kernel(rays_ref, tri_ref, t_out, id_out):
        t_cap = rays_ref[0, 6]
        acc_t = jnp.full((GROUP, LANES), BIG, jnp.float32)
        acc_id = jnp.full((GROUP, LANES), -1, jnp.int32)

        def sweep(slot, g, best_t, best_id):
            if roll:
                comp = []
                for c in range(6):
                    row = rays_ref[0, c]
                    rolled = pltpu.roll(row, shift=-g, axis=1)
                    comp.append(jnp.broadcast_to(rolled[:, 0:1],
                                                 (GROUP, LANES)))
                tc = pltpu.roll(t_cap, shift=-g, axis=1)
                g_cap = jnp.broadcast_to(tc[:, 0:1], (GROUP, LANES))
                o_l, d_l = comp[0:3], comp[3:6]
            else:
                o_l = [rays_ref[0, c] for c in range(3)]
                d_l = [rays_ref[0, 3 + c] for c in range(3)]
                g_cap = t_cap
            tid = (slot % 64) if dyn_tri else 0
            tile = tri_ref[tid]
            v0 = [tile[c:c + 1, :] for c in range(3)]
            e1 = [tile[3 + c:4 + c, :] for c in range(3)]
            e2 = [tile[6 + c:7 + c, :] for c in range(3)]
            hx = d_l[1] * e2[2] - d_l[2] * e2[1]
            hy = d_l[2] * e2[0] - d_l[0] * e2[2]
            hz = d_l[0] * e2[1] - d_l[1] * e2[0]
            a = e1[0] * hx + e1[1] * hy + e1[2] * hz
            par = jnp.abs(a) < 1e-8
            f = 1.0 / jnp.where(par, 1.0, a)
            sx = o_l[0] - v0[0]
            sy = o_l[1] - v0[1]
            sz = o_l[2] - v0[2]
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1[2] - sz * e1[1]
            qy = sz * e1[0] - sx * e1[2]
            qz = sx * e1[1] - sy * e1[0]
            v = f * (d_l[0] * qx + d_l[1] * qy + d_l[2] * qz)
            tc2 = f * (e2[0] * qx + e2[1] * qy + e2[2] * qz)
            ok = (~par & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (tc2 >= 1e-3) & (tc2 < g_cap)
                  & (tc2 < best_t))
            lane = jax.lax.broadcasted_iota(jnp.int32, best_t.shape, 1)
            pid = (tid * TILE + lane) << 5
            return (jnp.where(ok, tc2, best_t), jnp.where(ok, pid, best_id))

        if use_while:
            # emulate the bitscan: 32-bit words, n_sweeps bits total
            def word_body(w_idx, carry):
                def bit_body(c):
                    word, bt, bi = c
                    nz = word & (-word)
                    b = 31 - jax.lax.clz(nz)
                    slot = w_idx * 32 + b
                    g = slot % 128
                    bt, bi = sweep(slot, g, bt, bi)
                    return (word & (word - 1), bt, bi)

                bt, bi = carry
                _, bt, bi = jax.lax.while_loop(
                    lambda c: c[0] != 0, bit_body,
                    (jnp.int32(-1), bt, bi),  # 32 bits set
                )
                return bt, bi

            acc_t, acc_id = jax.lax.fori_loop(
                0, n_sweeps // 32, word_body, (acc_t, acc_id))
        else:
            def body(slot, carry):
                bt, bi = carry
                return sweep(slot, slot % 128, bt, bi)

            acc_t, acc_id = jax.lax.fori_loop(
                0, n_sweeps, body, (acc_t, acc_id))

        t_out[0] = acc_t
        id_out[0] = acc_id

    return kernel


def run(name, n_blocks, n_sweeps, **flags):
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.normal(size=(n_blocks, 7, GROUP, LANES))
                       .astype(np.float32))
    tri = jnp.asarray(rng.normal(size=(64, ROWS, TILE)).astype(np.float32))
    spec_r = pl.BlockSpec((1, 7, GROUP, LANES), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, GROUP, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        make_kernel(n_sweeps, **flags),
        grid=(n_blocks,),
        in_specs=[spec_r, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, GROUP, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, GROUP, LANES), jnp.int32),
        ],
    )
    f = jax.jit(lambda r, t: fn(r, t))
    r = f(rays, tri)
    float(r[0].sum())
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(rays, tri)
    s = float(r[0].sum())
    dt = (time.perf_counter() - t0) / 3
    total_sweeps = n_blocks * n_sweeps
    ns_per_sweep = dt / total_sweeps * 1e9
    cyc = ns_per_sweep * 0.94  # ~940 MHz
    print(f"{name:10s} {dt*1e3:8.2f} ms  {ns_per_sweep:8.1f} ns/sweep "
          f"(~{cyc:6.0f} cyc)  [{s:.3e}]")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=512)
    ap.add_argument("--blocks", type=int, default=512)
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    B, N = args.blocks, args.sweeps
    run("sweeponly", B, N, roll=False, dyn_tri=False, use_while=False)
    run("fori+tri", B, N, roll=False, dyn_tri=True, use_while=False)
    run("fori+roll", B, N, roll=True, dyn_tri=True, use_while=False)
    run("while", B, N, roll=False, dyn_tri=True, use_while=True)
    run("full", B, N, roll=True, dyn_tri=True, use_while=True)


if __name__ == "__main__":
    main()
