"""Chunked gradient rendering (inverse rendering at full resolution).

``sharding.train_step`` traces every ray in ONE program — fine for small
tuning problems, but a full-resolution 100-SPP Cornell gradient (20M
camera rays x depth-5 scan residuals) cannot hold its reverse-mode
activations in HBM at once.  This module computes the same gradients in
SPP/ray chunks, exploiting that the pixel-MSE loss is *quadratic in the
framebuffer*:

    L(fb)       = mean((fb/spp - target)^2)
    dL/dparams  = sum_chunks  d<radiance_chunk, g_fb>/dparams,
    g_fb        = dL/dfb = 2 (fb/spp - target) / (N * spp)   (a constant
                  once fb is known)

so pass 1 renders fb on the FAST forward path (winner-attribute /
megakernel kernels — bit-identical to the differentiable gather path,
tested), and pass 2 accumulates per-chunk parameter VJPs with the
constant cotangent g_fb.  Peak memory is one chunk's residuals.

This is the production inverse-rendering loop and what ``bench.py
--grad`` measures (BASELINE's "Mrays/s/chip fwd+bwd" headline).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..camera import Camera, generate_rays
from ..geometry.scene import Scene
from ..integrator import wavefront
from ..parallel.sharding import RAY_AXIS, apply_params, trainable_params
from . import renderer as rmod

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _chunk_rays(scene: Scene, cam: Camera, ray_start, seed, *,
                spp: int, chunk: int, max_depth: int):
    """Mirror renderer._render_chunk's ray-id -> pixel mapping exactly, so
    iterating over all chunks covers every (pixel, sample) once."""
    w, h = cam.image_width, cam.image_height
    tiled = rmod.scene_tiled(scene)
    _, _, n_virt = rmod.ray_layout(w, h, tiled)
    total = n_virt * spp

    ids = ray_start + jnp.arange(chunk, dtype=jnp.uint32)
    valid = ids < total
    ids = jnp.minimum(ids, total - 1)
    px, py, in_bounds = rmod._id_to_pixel(ids % n_virt, w, h, tiled)
    valid = valid & in_bounds
    pixel = (py * w + jnp.minimum(px, w - 1)).astype(jnp.uint32)
    pixel = jnp.minimum(pixel, w * h - 1)

    cam2 = dataclasses.replace(cam, max_depth=max_depth)
    o, d, tm = generate_rays(cam2, px, py, ids, seed)
    return cam2, o, d, tm, ids, pixel, valid


def _record_mega_mode(scene: Scene, cam: Camera, chunk: int,
                      max_depth: int) -> str:
    """Static megakernel decision for RECORD traces, made outside jit
    (wavefront.choose_mega_mode's contract).  Recording is single-phase
    only, so 'split' falls back to the scan-path record."""
    cam_d = dataclasses.replace(cam, max_depth=max_depth)
    mode = wavefront.choose_mega_mode(scene, cam_d, chunk, False)
    return "off" if mode == "split" else mode


@partial(jax.jit,
         static_argnames=("cam", "spp", "chunk", "max_depth", "mega_mode"),
         donate_argnames=("accum",))
def _record_chunk(scene: Scene, cam: Camera, accum, ray_start, seed, *,
                  spp: int, chunk: int, max_depth: int, mega_mode: str):
    """Pass-1 step: trace one chunk on the fast forward WITH decision
    recording, scatter its radiance into the framebuffer, and return the
    per-bounce discrete sweep outcomes for the chunk's later VJP."""
    cam2, o, d, tm, stream, pixel, valid = _chunk_rays(
        scene, cam, ray_start, seed, spp=spp, chunk=chunk,
        max_depth=max_depth)
    radiance, dec = wavefront.trace(
        scene, cam2, o, d, tm, stream, seed,
        differentiable=False, record=True, mega_mode=mega_mode,
    )
    rows = jnp.where(valid[:, None], radiance.rows(), 0.0)
    return accum.at[pixel].add(rows), dec


def _grad_kernel_body(scene: Scene, cam: Camera, g_virt, ray_start,
                      seed, *, spp: int, chunk: int, max_depth: int,
                      pathwise: bool = False, image: bool = False):
    """One chunk of the GRADIENT MEGAKERNEL path: the whole fwd+bwd of
    the bounce loop runs in one pallas kernel (ops/pallas_wavefront
    grad_mode — gate: pallas_wavefront.grad_applicable).  Returns the
    texture-table grads dict for the chunk.

    ``g_virt``: [n_virt, 3] per-VIRTUAL-PIXEL loss cotangent (zeros on
    out-of-bounds tile padding).  Chunks are sample-aligned, so the
    per-ray cotangent is g_virt TILED chunk//n_virt times — a broadcast,
    not the [chunk]-row gather g_fb[pixel] (which cost ~36 ms per 4M
    chunk, comparable to the kernel itself)."""
    from ..ops import pallas_wavefront as mega

    cam2, o, d, tm, stream, pixel, valid = _chunk_rays(
        scene, cam, ray_start, seed, spp=spp, chunk=chunk,
        max_depth=max_depth)
    n_virt = g_virt.shape[0]
    assert chunk % n_virt == 0
    reps = chunk // n_virt
    # per-CHANNEL [chunk] rows (CLAUDE.md rule 1: no [R,3] hot-path arrays)
    g3 = tuple(
        jnp.where(valid, jnp.broadcast_to(g_virt[None, :, c],
                                          (reps, n_virt)).reshape(chunk), 0.0)
        for c in range(3)
    )
    if image:
        return _grad_image_tier(scene, cam2, o, d, tm, stream, seed, g3)
    _, grads = mega.grad_megakernel(scene, cam2, o, d, tm, stream, seed, g3,
                                    pathwise=pathwise)
    return grads


def _grad_image_tier(scene: Scene, cam, o, d, tm, stream, seed, g3):
    """IMAGE-PREFACTOR gradient tier (round 5): for image_prefactor_ok
    scenes (rt/scenes.go:242-273 earth class) the radiance factorizes
    EXACTLY as A ⊙ W — A = the image albedo at the primary sphere hit
    (1.0 on miss; a convex sphere is never re-hit by its own scatter,
    the same invariant the forward 'image' mega mode is tested on) and
    W = the radiance of the texture-stripped WHITE scene.  So by the
    product rule:
      d<g, A⊙W>/d(white params) = product kernel with cotangent g⊙A,
      d<g, A⊙W>/d(atlas)        = nearest-texel segment-sum of g⊙W
                                  rows at the primary texel ids.
    One product-chain megakernel launch + one rows_segment_sum replace
    the ~10x-slower XLA replay backward (the last family that used it).
    Equivalence vs replay: tests/test_grad_render.py."""
    from ..core.segsum import cols_segment_sum
    from ..core.vec3 import V3
    from ..ops import pallas_wavefront as mega

    white = wavefront._strip_image(scene)
    A, texel, h_s = wavefront._primary_image_records(scene, o, d, tm)
    ac = (A.x, A.y, A.z)
    gW = tuple(g3[c] * ac[c] for c in range(3))
    rad_w, grads = mega.grad_megakernel(white, cam, o, d, tm, stream,
                                        seed, gW, pathwise=False)
    # the stripped texture's solid-color slot is unused in the real
    # scene (evaluate selects the texel): drop its cotangent
    from ..materials import textures as tex

    is_img = scene.textures.kind == tex.TEX_IMAGE
    grads = dict(grads)
    grads["color"] = jnp.where(is_img[:, None], 0.0, grads["color"])
    wc = (rad_w.x, rad_w.y, rad_w.z)
    n_texels = int(np.prod(scene.textures.atlas.shape[:3]))
    cot_cols = [jnp.where(h_s, g3[c] * wc[c], 0.0) for c in range(3)]
    ids = jnp.where(h_s, texel, n_texels)  # misses -> dropped
    grads["atlas"] = cols_segment_sum(ids, cot_cols, n_texels).reshape(
        scene.textures.atlas.shape)
    return grads


_grad_kernel_chunk = partial(jax.jit, static_argnames=(
    "cam", "spp", "chunk", "max_depth", "pathwise",
    "image"))(_grad_kernel_body)


def _twophase_fwd_body(scene: Scene, cam: Camera, ray_start, seed, *,
                       spp: int, chunk: int, max_depth: int,
                       pathwise: bool, image: bool = False):
    """TWO-PHASE pass A for one chunk (round 5): the gradient forward
    traces once, writing the per-bounce stash to HBM; its radiance IS
    the chunk's framebuffer contribution (bit-identical forward code),
    so the separate fb render disappears.  Returns ([n_virt, 3] partial
    fb rows, opaque carry for _twophase_rev_chunk)."""
    from ..ops import pallas_wavefront as mega

    from ..core.vec3 import V3

    cam2, o, d, tm, stream, pixel, valid = _chunk_rays(
        scene, cam, ray_start, seed, spp=spp, chunk=chunk,
        max_depth=max_depth)
    if image:
        # IMAGE-PREFACTOR two-phase: the WHITE scene traces with stash;
        # fb = A (x) W exactly (see _grad_image_tier); A / W / the
        # primary texel ids carry to pass B for the atlas cotangent
        white = wavefront._strip_image(scene)
        rad_w, carry_w = mega.grad_fwd_stash(
            white, cam2, o, d, tm, stream, seed, pathwise=False)
        A, texel, h_s = wavefront._primary_image_records(scene, o, d, tm)
        rad = A * rad_w
        carry = (carry_w, [A.x, A.y, A.z],
                 [rad_w.x, rad_w.y, rad_w.z], texel, h_s)
    else:
        rad, carry = mega.grad_fwd_stash(scene, cam2, o, d, tm, stream,
                                         seed, pathwise=pathwise)
    rows = jnp.where(valid[:, None], rad.rows(), 0.0)
    n_virt = rmod.ray_layout(cam.image_width, cam.image_height,
                             rmod.scene_tiled(scene))[2]
    assert chunk % n_virt == 0
    return rows.reshape(chunk // n_virt, n_virt, 3).sum(axis=0), carry


_twophase_fwd_chunk = partial(jax.jit, static_argnames=(
    "cam", "spp", "chunk", "max_depth", "pathwise",
    "image"))(_twophase_fwd_body)


def _twophase_carry_specs(scene: Scene):
    """shard_map PartitionSpecs for the pass-A carry pytree (rays axis
    sharded): non-env = (mc x3 [rows,128], stash_f, stash_i); env =
    (qcols x12 [r], mdir x3, mtp x3, mfl, stash_f, stash_i)."""
    row2 = P(RAY_AXIS, None)
    stash4 = P(None, None, RAY_AXIS, None)
    if scene.env is None:
        return ((row2,) * 3, stash4, stash4)
    r1 = P(RAY_AXIS)
    return ([r1] * 12, [r1] * 3, [r1] * 3, r1, stash4, stash4)


@partial(jax.jit,
         static_argnames=("cam", "spp", "chunk", "max_depth", "pathwise",
                          "mesh"))
def _twophase_fwd_chunk_sharded(scene: Scene, cam: Camera, ray_start,
                                seed, *, mesh: Mesh, spp: int, chunk: int,
                                max_depth: int, pathwise: bool):
    """Mesh-parallel pass A: per-device gradient forward + stash (the
    stash stays sharded on its device), one psum of the fb rows."""
    n_dev = mesh.devices.size
    per = chunk // n_dev
    starts = ray_start + jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(RAY_AXIS), P()),
             out_specs=(P(), _twophase_carry_specs(scene)))
    def run(scene_rep, start, seed_rep):
        vs, carry = _twophase_fwd_body(
            scene_rep, cam, start[0], seed_rep, spp=spp, chunk=per,
            max_depth=max_depth, pathwise=pathwise)
        return jax.lax.psum(vs, RAY_AXIS), carry

    return run(scene, starts, seed)


@partial(jax.jit,
         static_argnames=("cam", "spp", "chunk", "max_depth", "pathwise",
                          "mesh"),
         donate_argnames=("carry",))
def _twophase_rev_chunk_sharded(scene: Scene, cam: Camera, g_virt,
                                ray_start, seed, carry, *, mesh: Mesh,
                                spp: int, chunk: int, max_depth: int,
                                pathwise: bool):
    """Mesh-parallel pass B: per-device reverse against the sharded
    stash, one psum of the grads dict."""
    n_dev = mesh.devices.size
    per = chunk // n_dev
    starts = ray_start + jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(), P(RAY_AXIS), P(),
                       _twophase_carry_specs(scene)),
             out_specs=P())
    def run(scene_rep, g_virt_rep, start, seed_rep, carry_l):
        g = _twophase_rev_body(scene_rep, cam, g_virt_rep, start[0],
                               seed_rep, carry_l, spp=spp, chunk=per,
                               max_depth=max_depth, pathwise=pathwise)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, RAY_AXIS), g)

    return run(scene, g_virt, starts, seed, carry)


def _twophase_rev_body(scene: Scene, cam: Camera, g_virt, ray_start,
                       seed, carry, *, spp: int, chunk: int,
                       max_depth: int, pathwise: bool,
                       image: bool = False):
    """TWO-PHASE pass B for one chunk: reverse sweep against the
    donated pass-A stash; no re-trace, no sweeps."""
    from ..ops import pallas_wavefront as mega

    cam2, o, d, tm, stream, pixel, valid = _chunk_rays(
        scene, cam, ray_start, seed, spp=spp, chunk=chunk,
        max_depth=max_depth)
    n_virt = g_virt.shape[0]
    reps = chunk // n_virt
    g3 = tuple(
        jnp.where(valid, jnp.broadcast_to(g_virt[None, :, c],
                                          (reps, n_virt)).reshape(chunk), 0.0)
        for c in range(3)
    )
    if image:
        from ..core.segsum import cols_segment_sum
        from ..materials import textures as tex

        carry_w, ac, wc, texel, h_s = carry
        gW = tuple(g3[c] * ac[c] for c in range(3))
        white = wavefront._strip_image(scene)
        grads = dict(mega.grad_rev_stash(white, cam2, stream, seed, gW,
                                         carry_w, pathwise=False))
        is_img = scene.textures.kind == tex.TEX_IMAGE
        grads["color"] = jnp.where(is_img[:, None], 0.0, grads["color"])
        n_texels = int(np.prod(scene.textures.atlas.shape[:3]))
        cot_cols = [jnp.where(h_s, g3[c] * wc[c], 0.0) for c in range(3)]
        ids2 = jnp.where(h_s, texel, n_texels)
        grads["atlas"] = cols_segment_sum(
            ids2, cot_cols, n_texels).reshape(scene.textures.atlas.shape)
        return grads
    return mega.grad_rev_stash(scene, cam2, stream, seed, g3, carry,
                               pathwise=pathwise)


_twophase_rev_chunk = partial(
    jax.jit,
    static_argnames=("cam", "spp", "chunk", "max_depth", "pathwise",
                     "image"),
    donate_argnames=("carry",))(_twophase_rev_body)


@partial(jax.jit,
         static_argnames=("cam", "spp", "chunk", "max_depth", "pathwise",
                          "image", "mesh"))
def _grad_kernel_chunk_sharded(scene: Scene, cam: Camera, g_virt, ray_start,
                               seed, *, mesh: Mesh, spp: int, chunk: int,
                               max_depth: int, pathwise: bool = False,
                               image: bool = False):
    """Mesh-parallel gradient-megakernel chunk: the global ``chunk`` is
    split into contiguous per-device slices over Mesh('rays'); each
    device runs the gradient megakernel on its slice and the grads dict
    is psum-reduced over ICI (table-sized payload — SCALING.json says
    ~232 bytes for Cornell, one all-reduce per chunk).  Bit-identical
    ray streams: the RNG is keyed on global ray ids, so the partition
    changes only the order of the final adds.  Reference analog: the
    bucket worker pool DP, rt/bucket_renderer.go:194-251."""
    n_dev = mesh.devices.size
    per = chunk // n_dev
    assert per * n_dev == chunk
    starts = ray_start + jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(), P(RAY_AXIS), P()), out_specs=P())
    def run(scene_rep, g_virt_rep, start, seed_rep):
        g = _grad_kernel_body(scene_rep, cam, g_virt_rep, start[0], seed_rep,
                              spp=spp, chunk=per, max_depth=max_depth,
                              pathwise=pathwise, image=image)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, RAY_AXIS), g)

    return run(scene, g_virt, starts, seed)


def _fb_rows_body(scene: Scene, cam: Camera, ray_start, seed, *, spp: int,
                  chunk: int, max_depth: int, mega_mode):
    """[n_virt, 3] partial radiance sums for one sample-aligned chunk of
    the FAST forward (renderer._render_chunk's reshape+sum trick)."""
    cam2, o, d, tm, stream, pixel, valid = _chunk_rays(
        scene, cam, ray_start, seed, spp=spp, chunk=chunk,
        max_depth=max_depth)
    radiance = wavefront.trace(
        scene, cam2, o, d, tm, stream, seed, differentiable=False,
        mega_mode=mega_mode)
    rows = jnp.where(valid[:, None], radiance.rows(), 0.0)
    n_virt = rmod.ray_layout(cam.image_width, cam.image_height,
                             rmod.scene_tiled(scene))[2]
    assert chunk % n_virt == 0
    return rows.reshape(chunk // n_virt, n_virt, 3).sum(axis=0)


_fb_rows_chunk = partial(jax.jit, static_argnames=(
    "cam", "spp", "chunk", "max_depth", "mega_mode"))(_fb_rows_body)


@partial(jax.jit,
         static_argnames=("cam", "spp", "chunk", "max_depth", "mega_mode",
                          "mesh"))
def _fb_vs_chunk_sharded(scene: Scene, cam: Camera, ray_start, seed, *,
                         mesh: Mesh, spp: int, chunk: int, max_depth: int,
                         mega_mode):
    """Mesh-parallel fast-forward chunk returning the psum'd [n_virt, 3]
    partial rows (no accumulator scatter — the two-phase fb assembly
    scatters once at the end)."""
    n_dev = mesh.devices.size
    per = chunk // n_dev
    starts = ray_start + jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(RAY_AXIS), P()), out_specs=P())
    def run(scene_rep, start, seed_rep):
        vs = _fb_rows_body(scene_rep, cam, start[0], seed_rep, spp=spp,
                           chunk=per, max_depth=max_depth,
                           mega_mode=mega_mode)
        return jax.lax.psum(vs, RAY_AXIS)

    return run(scene, starts, seed)


@partial(jax.jit,
         static_argnames=("cam", "spp", "chunk", "max_depth", "mega_mode",
                          "mesh"),
         donate_argnames=("accum",))
def _fb_chunk_sharded(scene: Scene, cam: Camera, accum, ray_start, seed, *,
                      mesh: Mesh, spp: int, chunk: int, max_depth: int,
                      mega_mode):
    """Mesh-parallel fast-forward chunk: per-device partial [n_virt, 3]
    radiance rows, one psum, one host-side scatter into the flat accum
    (the psum replaces the reference's mutex-guarded framebuffer,
    rt/bucket_renderer.go:292-300)."""
    n_dev = mesh.devices.size
    per = chunk // n_dev
    starts = ray_start + jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(RAY_AXIS), P()), out_specs=P())
    def run(scene_rep, start, seed_rep):
        vs = _fb_rows_body(scene_rep, cam, start[0], seed_rep, spp=spp,
                           chunk=per, max_depth=max_depth,
                           mega_mode=mega_mode)
        return jax.lax.psum(vs, RAY_AXIS)

    vs = run(scene, starts, seed)
    w, h = cam.image_width, cam.image_height
    tiled = rmod.scene_tiled(scene)
    if not tiled:
        return accum + vs
    n_virt = vs.shape[0]
    ids_v = jnp.arange(n_virt, dtype=jnp.uint32)
    pxv, pyv, _ = rmod._id_to_pixel(ids_v, w, h, True)
    pixv = jnp.minimum((pyv * w + jnp.minimum(pxv, w - 1)).astype(jnp.uint32),
                       w * h - 1)
    return accum.at[pixv].add(vs)  # out-of-bounds rows are already zero


def _fb_sharded(scene: Scene, cam: Camera, mesh: Mesh, *, spp: int,
                max_depth: int, seed, chunk: int):
    """Sharded fast-forward framebuffer [H, W, 3] (summed radiance):
    every chunk is split across the mesh; requires chunk % (n_virt *
    n_devices) == 0 so per-device slices stay sample-aligned."""
    w, h = cam.image_width, cam.image_height
    _, _, n_virt = rmod.ray_layout(w, h, rmod.scene_tiled(scene))
    total = n_virt * spp
    n_dev = mesh.devices.size
    cam_d = dataclasses.replace(cam, max_depth=max_depth)
    mode = wavefront.choose_mega_mode(scene, cam_d, chunk // n_dev, False)
    flat = jnp.zeros((w * h, 3), jnp.float32)
    pos = 0
    while pos < total:
        flat = _fb_chunk_sharded(scene, cam, flat, jnp.uint32(pos), seed,
                                 mesh=mesh, spp=spp, chunk=chunk,
                                 max_depth=max_depth, mega_mode=mode)
        pos += chunk
    return flat.reshape(h, w, 3)


def _chunk_vjp_body(scene: Scene, cam: Camera, g_fb_flat, ray_start, seed, *,
                    spp: int, chunk: int, max_depth: int, dec=None,
                    mega_mode: str = "off"):
    """Parameter gradient of <chunk radiance, g_fb> for one ray chunk.

    ``dec``: the chunk's recorded sweep outcomes from :func:`_record_chunk`
    (pass 1).  When None, a record pass runs here (re-tracing the chunk) —
    the fallback when decisions were too big to keep resident."""
    cam2, o, d, tm, stream, pixel, valid = _chunk_rays(
        scene, cam, ray_start, seed, spp=spp, chunk=chunk,
        max_depth=max_depth)
    cot = jnp.where(valid[:, None], g_fb_flat[pixel], 0.0)  # [chunk, 3]

    import os

    use_replay = os.environ.get("GRT_NO_REPLAY") != "1"
    if use_replay and dec is None:
        # Record pass: fast non-differentiable forward, keeping only the
        # per-bounce discrete sweep outcomes; the replayed backward then
        # skips every intersection/shadow sweep (wavefront._winner_t).
        _, dec = wavefront.trace(
            scene, cam2, o, d, tm, stream, seed,
            differentiable=False, record=True, mega_mode=mega_mode,
        )
    elif not use_replay:
        dec = None

    def inner(params):
        s = apply_params(scene, params)
        radiance = wavefront.trace(
            s, cam2, o, d, tm, stream, seed, differentiable=True,
            decisions=dec,
        )
        return jnp.sum(radiance.rows() * cot)

    return jax.grad(inner)(trainable_params(scene))


_chunk_vjp = partial(jax.jit, static_argnames=(
    "cam", "spp", "chunk", "max_depth", "mega_mode"))(_chunk_vjp_body)


@partial(jax.jit,
         static_argnames=("cam", "spp", "chunk", "max_depth", "mega_mode",
                          "mesh"))
def _chunk_vjp_sharded(scene: Scene, cam: Camera, g_fb_flat, ray_start,
                       seed, *, mesh: Mesh, spp: int, chunk: int,
                       max_depth: int, mega_mode: str = "off"):
    """Mesh-parallel REPLAY-tier chunk: each device records its ray
    slice's discrete sweep outcomes and replays the differentiable
    backward locally (decisions never leave the device), then the grads
    dict is psum-reduced.  Used for scenes outside the gradient-kernel
    gates when a mesh is given."""
    n_dev = mesh.devices.size
    per = chunk // n_dev
    starts = ray_start + jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(), P(RAY_AXIS), P()), out_specs=P())
    def run(scene_rep, g_rep, start, seed_rep):
        g = _chunk_vjp_body(scene_rep, cam, g_rep, start[0], seed_rep,
                            spp=spp, chunk=per, max_depth=max_depth,
                            dec=None, mega_mode=mega_mode)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, RAY_AXIS), g)

    return run(scene, g_fb_flat, starts, seed)


def render_grad(scene: Scene, cam: Camera, target, *, spp: Optional[int] = None,
                max_depth: Optional[int] = None, seed: int = 0,
                chunk: Optional[int] = None,
                stats: Optional[rmod.RenderStats] = None,
                mesh: Optional[Mesh] = None):
    """Full-resolution loss + parameter gradients, chunked.

    target: [H, W, 3] image the render is being fit to.
    Returns (loss, grads dict) where grads matches
    ``sharding.trainable_params``.  Gradients are EXACTLY those of
    mean((render/spp - target)^2) because the loss is quadratic in the
    framebuffer (see module docstring) and forward/backward replay the
    same RNG streams.

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` — every chunk is then
    split into contiguous per-device ray slices via shard_map and the
    per-chunk grads dict / framebuffer rows are psum-reduced over ICI
    (the BASELINE north-star composition: fast chunked gradients x data
    parallelism).  RNG streams are keyed on global ray ids, so results
    match the single-device path up to float summation order.
    """
    import os

    spp = cam.samples_per_pixel if spp is None else spp
    max_depth = cam.max_depth if max_depth is None else max_depth
    w, h = cam.image_width, cam.image_height
    _, _, n_virt = rmod.ray_layout(w, h, rmod.scene_tiled(scene))
    n_dev = mesh.devices.size if mesh is not None else 1
    explicit_chunk = chunk
    if chunk is None:
        # gradient residuals (scan carries) cost ~2x the forward: halve
        chunk = max(rmod.pick_chunk_size(scene) // 2, 1024)
        chunk = min(chunk, max(1024, -(-n_virt * spp // 1024) * 1024))
    total = n_virt * spp
    n_chunks = -(-total // chunk)

    # Keep pass-1 decisions resident so pass 2 never re-traces a ray —
    # unless they would not fit (3 x i32 + 2 x bool per (ray, bounce)).
    dec_bytes = n_chunks * chunk * max_depth * 14
    budget = int(float(os.environ.get("GRT_DEC_BUDGET", 6e9)))
    keep_dec = (dec_bytes <= budget
                and os.environ.get("GRT_NO_REPLAY") != "1")

    target = jnp.asarray(target, jnp.float32).reshape(h, w, 3)
    n = w * h * 3
    grads = jax.tree_util.tree_map(
        jnp.zeros_like, trainable_params(scene)
    )

    # GRADIENT MEGAKERNEL path: for direction-parameter-independent
    # scenes (lambertian/light/isotropic) the whole fwd+bwd of a chunk
    # runs in ONE pallas kernel — the path adjoint is an exact in-kernel
    # product-chain reverse sweep, and fuzz/ior/atlas grads are
    # structurally zero (ops/pallas_wavefront.grad_applicable).  Env
    # scenes ride the kernels too: miss-only env on either kernel (texel
    # scatter + λ_mdir streamed) and env + NEE lights on the pathwise
    # kernel (per-bounce importance rows in, texel cotangent rows out —
    # see grad_megakernel).  Round 5 admits volumes (scatter-distance
    # adjoint) and noise (∂marble/∂p) to the pathwise kernel and gives
    # image_prefactor_ok scenes their own tier (_grad_image_tier), so
    # the replay fallback below serves only mesh scenes and
    # out-of-gate combinations.  ~10x the XLA replay backward;
    # equivalence tested vs it.
    from ..ops import pallas_wavefront as mega

    kern_ok = os.environ.get("GRT_NO_GRADKERNEL") != "1"
    use_product = kern_ok and mega.grad_applicable(scene, max_depth)
    # PATHWISE kernel: metal/dielectric scenes (fuzz/IOR gradients via
    # in-kernel scatter-direction adjoints).  The all-diffuse product
    # chain stays preferred where it applies (lighter stash + reverse).
    use_pathwise = (kern_ok and not use_product
                    and mega.grad_pathwise_applicable(scene, max_depth)
                    and os.environ.get("GRT_NO_PATHWISE") != "1")
    # IMAGE-PREFACTOR tier (round 5): earth-class scenes factor as
    # A ⊙ W, so the white scene rides the product kernel and the atlas
    # gets a nearest-texel segment-sum (see _grad_image_tier)
    use_image = (kern_ok and not use_product and not use_pathwise
                 and os.environ.get("GRT_NO_IMAGEGRAD") != "1"
                 and wavefront.image_prefactor_ok(scene)
                 and mega.grad_applicable(wavefront._strip_image(scene),
                                          max_depth))
    if use_product or use_pathwise or use_image:
        # TWO-PHASE stash-resume (round 5): pass A = gradient forward
        # once, stash to HBM, radiance -> framebuffer (the separate fb
        # render disappears — it was ~45% of the headline wall); pass B
        # = reverse-only against the stash.  Gated on the total stash
        # fitting HBM alongside the working set.
        n_srows = ((20 if scene.has_noise else 19) if use_pathwise
                   else 12) + 3
        if use_image:
            # image tier: the WHITE scene is what stashes (pass A also
            # carries A / W / texel records); single-device only
            two_phase = (mesh is None
                         and os.environ.get("GRT_NO_TWOPHASE") != "1"
                         and mega.grad_two_phase_ok(
                             wavefront._strip_image(scene), max_depth))
        else:
            two_phase = (os.environ.get("GRT_NO_TWOPHASE") != "1"
                         and mega.grad_two_phase_ok(scene, max_depth))
        # honor an explicit caller chunk (A/B experiments).  FUSED
        # (non-two-phase) non-env scenes take 2x the forward pick —
        # fewer launches measured +5% on the round-4 fused headline
        # (41.8 -> 44.0 Mrays/s at 2 chunks vs 5); two-phase scenes
        # keep pick-sized chunks (5-chunk cornell measured 78.4 vs
        # 75.4 for one 20M chunk) except env, which grows to the stash
        # budget below.
        pick = rmod.pick_chunk_size(scene)
        if scene.env is None and not two_phase:
            pick = 2 * pick
        kchunk = max(explicit_chunk if explicit_chunk is not None
                     else pick, 1024)
        kchunk = min(kchunk, max(1024, -(-total // 1024) * 1024))
        # sample-aligned, and per-DEVICE-slice sample-aligned under a mesh
        align = n_virt * n_dev
        kchunk = max(kchunk // align, 1) * align
        if explicit_chunk is None:
            # EQUALIZE chunks: a ragged tail (e.g. 4.19M + 4.19M + 0.62M
            # on hdri-test) pays the per-launch fixed costs for a sliver
            # of work; round the chunk UP so every launch is same-sized
            nch = max(-(-total // kchunk), 1)
            kchunk = -(-(-(-total // nch)) // align) * align
        if two_phase:
            # every chunk's stash is resident between the passes; jobs
            # over budget stash a PREFIX of chunks and run the rest
            # fused (each stashed chunk still saves one forward trace).
            # env chunks also carry the miss footprint (12 quad columns
            # + miss records) between the passes.
            carry_rows = (11 if use_image
                          else 19 if scene.env is not None else 3)
            per_ray = (max_depth * n_srows + carry_rows) * 4
            budget = int(float(os.environ.get("GRT_STASH_BUDGET", 9e9)))
            if (explicit_chunk is None and mesh is None
                    and scene.env is not None):
                # ENV two-phase pays big per-chunk fixed costs (env
                # fetch + sort/scan/place rounds): grow chunks to the
                # stash budget — hdri-test becomes ONE 9M chunk
                # (measured 10.7 -> 15.3 Mrays/s).  NON-env scenes keep
                # pick-sized chunks: a single 20M cornell chunk
                # measured 75.4 vs 78.4 at 5 chunks (pipelining wins).
                kmax = max(int(budget // per_ray), 1024)
                kchunk = min(max(kchunk, kmax), max(total, 1))
                kchunk = max(kchunk // align, 1) * align
                nch = max(-(-total // kchunk), 1)
                kchunk = -(-(-(-total // nch)) // align) * align
            chunk_bytes = kchunk * per_ray
            n_stash = min(int(budget // max(chunk_bytes, 1)),
                          -(-total // kchunk))
            two_phase = n_stash > 0
        if two_phase:
            flat_vs = None
            carries = []
            pos = 0
            while pos < total:
                if len(carries) < n_stash:
                    if mesh is not None:
                        vs, carry = _twophase_fwd_chunk_sharded(
                            scene, cam, jnp.uint32(pos), seed, mesh=mesh,
                            spp=spp, chunk=kchunk, max_depth=max_depth,
                            pathwise=use_pathwise)
                    else:
                        vs, carry = _twophase_fwd_chunk(
                            scene, cam, jnp.uint32(pos), seed, spp=spp,
                            chunk=kchunk, max_depth=max_depth,
                            pathwise=use_pathwise, image=use_image)
                else:
                    # over budget: plain fast forward, fused fwd+bwd
                    # in pass B (the pre-round-5 flow, per chunk)
                    cam_d = dataclasses.replace(cam, max_depth=max_depth)
                    mm = wavefront.choose_mega_mode(
                        scene, cam_d,
                        kchunk // (mesh.devices.size if mesh else 1),
                        False)
                    if mesh is not None:
                        vs = _fb_vs_chunk_sharded(
                            scene, cam, jnp.uint32(pos), seed, mesh=mesh,
                            spp=spp, chunk=kchunk, max_depth=max_depth,
                            mega_mode=mm)
                    else:
                        vs = _fb_rows_chunk(
                            scene, cam, jnp.uint32(pos), seed, spp=spp,
                            chunk=kchunk, max_depth=max_depth,
                            mega_mode=mm)
                    carry = None
                flat_vs = vs if flat_vs is None else flat_vs + vs
                carries.append(carry)
                pos += kchunk
            tiled = rmod.scene_tiled(scene)
            if tiled:
                ids_v = jnp.arange(n_virt, dtype=jnp.uint32)
                pxv, pyv, _ = rmod._id_to_pixel(ids_v, w, h, True)
                pixv = jnp.minimum(
                    (pyv * w + jnp.minimum(pxv, w - 1)).astype(jnp.uint32),
                    w * h - 1)
                fb = jnp.zeros((w * h, 3), jnp.float32).at[pixv].add(
                    flat_vs).reshape(h, w, 3)
            else:
                fb = flat_vs.reshape(h, w, 3)
            resid = fb / spp - target
            loss = jnp.mean(resid * resid)
            g_fb_flat = (2.0 / (n * spp)) * resid.reshape(w * h, 3)
            if tiled:
                g_virt = jnp.where(
                    rmod._id_to_pixel(jnp.arange(n_virt, dtype=jnp.uint32),
                                      w, h, True)[2][:, None],
                    g_fb_flat[pixv], 0.0)
            else:
                g_virt = g_fb_flat
            pos = 0
            for i, carry in enumerate(carries):
                if carry is None:  # over-budget chunk: fused fwd+bwd
                    if mesh is not None:
                        g = _grad_kernel_chunk_sharded(
                            scene, cam, g_virt, jnp.uint32(pos), seed,
                            mesh=mesh, spp=spp, chunk=kchunk,
                            max_depth=max_depth, pathwise=use_pathwise,
                            image=False)
                    else:
                        g = _grad_kernel_chunk(
                            scene, cam, g_virt, jnp.uint32(pos), seed,
                            spp=spp, chunk=kchunk, max_depth=max_depth,
                            pathwise=use_pathwise, image=use_image)
                elif mesh is not None:
                    g = _twophase_rev_chunk_sharded(
                        scene, cam, g_virt, jnp.uint32(pos), seed, carry,
                        mesh=mesh, spp=spp, chunk=kchunk,
                        max_depth=max_depth, pathwise=use_pathwise)
                    carries[i] = None  # stash freed (donated)
                else:
                    g = _twophase_rev_chunk(
                        scene, cam, g_virt, jnp.uint32(pos), seed, carry,
                        spp=spp, chunk=kchunk, max_depth=max_depth,
                        pathwise=use_pathwise, image=use_image)
                    carries[i] = None  # stash freed (donated)
                for k in g:
                    grads[k] = grads[k] + g[k]
                pos += kchunk
            if stats is not None:
                stats.chunks += len(carries)
            return loss, grads
        if mesh is not None:
            fb = _fb_sharded(scene, cam, mesh, spp=spp, max_depth=max_depth,
                             seed=seed, chunk=kchunk)
        else:
            fb = rmod.render(scene, cam, spp=spp, max_depth=max_depth,
                             seed=seed, chunk=kchunk, stats=stats, sync=False)
        resid = fb / spp - target
        loss = jnp.mean(resid * resid)
        g_fb_flat = (2.0 / (n * spp)) * resid.reshape(w * h, 3)
        # per-virtual-pixel cotangent (one gather for tiled layouts, a
        # no-op for untiled ones); chunks then tile it sample-wise.
        tiled = rmod.scene_tiled(scene)
        if tiled:
            ids_v = jnp.arange(n_virt, dtype=jnp.uint32)
            pxv, pyv, inb = rmod._id_to_pixel(ids_v, w, h, True)
            pixv = jnp.minimum((pyv * w + jnp.minimum(pxv, w - 1)
                                ).astype(jnp.uint32), w * h - 1)
            g_virt = jnp.where(inb[:, None], g_fb_flat[pixv], 0.0)
        else:
            g_virt = g_fb_flat
        pos = 0
        while pos < total:
            if mesh is not None:
                g = _grad_kernel_chunk_sharded(
                    scene, cam, g_virt, jnp.uint32(pos), seed, mesh=mesh,
                    spp=spp, chunk=kchunk, max_depth=max_depth,
                    pathwise=use_pathwise, image=use_image)
            else:
                g = _grad_kernel_chunk(scene, cam, g_virt, jnp.uint32(pos),
                                       seed, spp=spp, chunk=kchunk,
                                       max_depth=max_depth,
                                       pathwise=use_pathwise,
                                       image=use_image)
            for k in g:
                grads[k] = grads[k] + g[k]
            pos += kchunk
        if stats is not None:
            stats.chunks += -(-total // kchunk)
        return loss, grads

    if mesh is not None:
        # REPLAY tier under a mesh: sharded fast-forward framebuffer,
        # then per-chunk record+replay VJPs with the decisions resident
        # per device (never crossing shard_map) and one grads psum.
        align = n_virt * n_dev
        chunk = max(chunk // align, 1) * align
        fb = _fb_sharded(scene, cam, mesh, spp=spp, max_depth=max_depth,
                         seed=seed, chunk=chunk)
        resid = fb / spp - target
        loss = jnp.mean(resid * resid)
        g_fb_flat = (2.0 / (n * spp)) * resid.reshape(w * h, 3)
        rec_mode = _record_mega_mode(scene, cam, chunk // n_dev, max_depth)
        pos = 0
        while pos < total:
            g = _chunk_vjp_sharded(scene, cam, g_fb_flat, jnp.uint32(pos),
                                   seed, mesh=mesh, spp=spp, chunk=chunk,
                                   max_depth=max_depth, mega_mode=rec_mode)
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
            pos += chunk
        if stats is not None:
            stats.chunks += -(-total // chunk)
        return loss, grads

    rec_mode = _record_mega_mode(scene, cam, chunk, max_depth)
    if keep_dec:
        # Pass 1: record forward (radiance identical to the fast render;
        # tested) + per-chunk decisions.
        flat = jnp.zeros((w * h, 3), jnp.float32)
        decs = []
        pos = 0
        while pos < total:
            flat, dec = _record_chunk(scene, cam, flat, jnp.uint32(pos),
                                      seed, spp=spp, chunk=chunk,
                                      max_depth=max_depth,
                                      mega_mode=rec_mode)
            decs.append(dec)
            pos += chunk
        fb = flat.reshape(h, w, 3)
        resid = fb / spp - target
        loss = jnp.mean(resid * resid)
        g_fb_flat = (2.0 / (n * spp)) * resid.reshape(w * h, 3)

        # Pass 2: replay VJPs — every sweep outcome is already known.
        for i, dec in enumerate(decs):
            g = _chunk_vjp(scene, cam, g_fb_flat, jnp.uint32(i * chunk),
                           seed, spp=spp, chunk=chunk, max_depth=max_depth,
                           dec=dec)
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
            decs[i] = None  # free the chunk's decisions as consumed
    else:
        # Fallback: fast framebuffer pass, then record+VJP per chunk.
        fb = rmod.render(scene, cam, spp=spp, max_depth=max_depth,
                         seed=seed, chunk=chunk, stats=stats)
        resid = fb / spp - target
        loss = jnp.mean(resid * resid)
        g_fb_flat = (2.0 / (n * spp)) * resid.reshape(w * h, 3)
        pos = 0
        while pos < total:
            g = _chunk_vjp(scene, cam, g_fb_flat, jnp.uint32(pos), seed,
                           spp=spp, chunk=chunk, max_depth=max_depth,
                           mega_mode=rec_mode)
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
            pos += chunk
    if stats is not None:
        stats.chunks += n_chunks
    return loss, grads
