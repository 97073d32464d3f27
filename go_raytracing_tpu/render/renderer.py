"""Megabatch tile renderer.

The reference's bucket renderer (rt/bucket_renderer.go) splits the image
into 32x32 spiral-ordered tiles pulled by a goroutine worker pool; the TPU
formulation flattens (pixels x samples) into one ray stream and launches it
in fixed-size chunks of a single jitted program — tiles become chunk
boundaries, the worker pool becomes the VPU/MXU, and the mutex-guarded
framebuffer (rt/bucket_renderer.go:292-300) becomes a scatter-add into the
accumulation buffer.

Progressive multi-pass rendering (preview 1 SPP/depth 3 -> refine -> final,
rt/bucket_renderer.go:170-191) maps to SPP-chunked scheduling: see
``render_progressive``.  Because the RNG is counter-based over
(pixel, sample), SPP chunks also double as checkpoint units: the
accumulator + the number of completed samples fully determine resumption.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..camera import Camera, generate_rays
from ..core import film
from ..geometry.scene import Scene
from ..integrator import wavefront

# Cap on rays*primitives pair buffers, to bound the [R, N] intermediates.
DEFAULT_PAIR_BUDGET = 1 << 26


def _scene_prim_count(scene: Scene) -> int:
    n = int(
        scene.spheres.radius.shape[0]
        + scene.planar.d.shape[0]
        + scene.volumes.neg_inv_density.shape[0]
    )
    # Mesh traversal cost per ray ~ frontier capacity (cap_factor * levels
    # * BRANCH); charge a flat equivalent per prototype for chunk sizing.
    n += 256 * len(scene.meshes)
    return n


def pick_chunk_size(scene: Scene, *, pair_budget: int = DEFAULT_PAIR_BUDGET,
                    max_rays: int = 1 << 20) -> int:
    from ..ops import pallas_intersect as _pk

    if _pk.enabled():
        # Pallas kernels never materialize [R, N] pair buffers, so only
        # volumes/meshes bound memory; amortize the per-dispatch floor
        # with much larger launches.  Mesh frontiers allocate
        # O(R * cap_factor) pair buffers + per-instance local rays, so
        # mesh scenes stay at moderate chunks.
        n = max(scene.volumes.neg_inv_density.shape[0] * 4, 16)
        max_rays = 1 << 22
        if scene.meshes:
            from ..ops import pallas_mesh as _pm
            from ..ops import pallas_mesh_stream as _pms

            if all(_pm.kernel_ok(p) or _pms.stream_ok(p)
                   for p in scene.meshes):
                # SMEM segment-sweep / leaf-stream kernels: no frontier
                # buffers, so keep launches big (coherence sort + cull
                # amortize over the whole chunk)
                max_rays = 1 << 21
            else:
                # XLA frontier pair buffers scale as chunk * cap_factor *
                # LEAF_SIZE; 64K rays keeps them ~64 MB/array.
                max_rays = 1 << 16
    else:
        n = max(_scene_prim_count(scene), 1)
    chunk = min(max_rays, max(pair_budget // n, 4096))
    return int(max(1024, (chunk // 1024) * 1024))


BUCKET = 32  # pixel tile side — the reference's bucket size (main.go:83)


def ray_layout(w: int, h: int, tiled: bool):
    """Pixel-grid layout for ray ids.

    ``tiled``: rays ordered in 32x32 pixel buckets (padded grid) so that
    consecutive ray ids — and therefore pallas grid blocks — are
    *spatially coherent*: the mesh kernel's segment early-outs prune per
    block, like the reference's spiral buckets fed to workers
    (rt/bucket_renderer.go:77-125).  Mesh scenes use this; other scenes
    use the plain linear layout (no padding, no index math).
    Returns (tiles_x, tiles_y, n_virtual_pixels).
    """
    if not tiled:
        return 0, 0, w * h
    tiles_x = -(-w // BUCKET)
    tiles_y = -(-h // BUCKET)
    return tiles_x, tiles_y, tiles_x * tiles_y * BUCKET * BUCKET


def _id_to_pixel(ids, w: int, h: int, tiled: bool):
    """Ray id (within one sample) -> (px, py, in-bounds mask)."""
    if not tiled:
        px = (ids % w).astype(jnp.int32)
        py = (ids // w).astype(jnp.int32)
        return px, py, py < h
    tiles_x, _, _ = ray_layout(w, h, True)
    per_tile = BUCKET * BUCKET
    tile = ids // per_tile
    within = ids % per_tile
    px = ((tile % tiles_x) * BUCKET + within % BUCKET).astype(jnp.int32)
    py = ((tile // tiles_x) * BUCKET + within // BUCKET).astype(jnp.int32)
    return px, py, (px < w) & (py < h)


def scene_tiled(scene) -> bool:
    """Tiled ray layout where block coherence pays: mesh scenes (stream
    kernel segment early-outs are per block) and sphere-segment-culled
    megakernel scenes (>= SPH_CULL_MIN spheres: compact 32x32 pixel
    buckets keep a block's rays — and everything they scatter into —
    spatially tight, so per-block Morton-segment slab tests cull more)."""
    from ..ops.pallas_wavefront import SPH_CULL_MIN

    return (len(scene.meshes) > 0
            or int(scene.spheres.radius.shape[0]) >= SPH_CULL_MIN)


@partial(jax.jit,
         static_argnames=("cam", "spp", "chunk", "max_depth", "differentiable",
                          "mega_mode"),
         donate_argnames=("accum",))
def _render_chunk(scene, cam: Camera, accum, ray_start, seed, *, spp: int,
                  chunk: int, max_depth: int, differentiable: bool = False,
                  mega_mode: str = None):
    """Trace ``chunk`` rays starting at global ray id ``ray_start`` and
    scatter-add their radiance into the flat accumulator [W*H, 3]."""
    w, h = cam.image_width, cam.image_height
    tiled = scene_tiled(scene)
    _, _, n_virt = ray_layout(w, h, tiled)
    total = n_virt * spp

    ids = ray_start + jnp.arange(chunk, dtype=jnp.uint32)
    valid = ids < total
    ids = jnp.minimum(ids, total - 1)
    px, py, in_bounds = _id_to_pixel(ids % n_virt, w, h, tiled)
    valid = valid & in_bounds
    pixel = (py * w + jnp.minimum(px, w - 1)).astype(jnp.uint32)
    pixel = jnp.minimum(pixel, w * h - 1)
    # Stream id = sample * n_virt + virtual_pixel == the global ray id:
    # independent of the total spp, so SPP-chunked/resumed renders and any
    # chunking layout produce identical samples.
    stream = ids

    cam2 = dataclasses.replace(cam, max_depth=max_depth)
    o, d, tm = generate_rays(cam2, px, py, stream, seed)
    radiance, tstats = wavefront.trace(
        scene, cam2, o, d, tm, stream, seed, differentiable=differentiable,
        mega_mode=mega_mode, with_stats=True,
    )
    rows = jnp.where(valid[:, None], radiance.rows(), 0.0)
    # Sample-aligned chunks (render() rounds chunk to a multiple of n_virt
    # and starts chunks on sample boundaries): ids % n_virt is the SAME
    # arange pattern for every chunk, so per-pixel accumulation is a
    # reshape+sum over the chunk's whole samples — the 4M-element
    # scatter-add was ~165 ms/chunk on TPU (scripts/slow_probe.py), a
    # third of hdri-test's wall time.  Untiled layouts need no scatter at
    # all (virtual pixel == pixel); tiled layouts scatter once per chunk
    # at n_virt elements (11x fewer).  INVARIANT: this branch also needs
    # ray_start % n_virt == 0 (chunks start on sample boundaries) or the
    # arange pattern would scatter radiance to wrong pixels — render()
    # aligns start and rounds chunk; assert it for any future caller.
    if chunk % n_virt == 0:
        checkify_start_aligned = ray_start % jnp.uint32(n_virt)
        rows = jnp.where((checkify_start_aligned == 0)[None, None],
                         rows, jnp.nan)  # misuse -> loud NaNs, not silence
        vs = rows.reshape(chunk // n_virt, n_virt, 3).sum(axis=0)
        if not tiled:
            return accum + vs, tstats["mesh_overflow"]
        vpixel = pixel[:n_virt]
        return accum.at[vpixel].add(vs), tstats["mesh_overflow"]
    return accum.at[pixel].add(rows), tstats["mesh_overflow"]


@dataclasses.dataclass
class RenderStats:
    rays_traced: int = 0
    wall_seconds: float = 0.0
    chunks: int = 0
    # Dropped mesh-frontier (ray, node) pairs (mesh_bvh.intersect_mesh
    # capacity overruns).  Nonzero means hits may have been missed —
    # raise wavefront.MESH_CAP_FACTOR.  Always 0 on the Pallas kernel path.
    mesh_overflow: int = 0

    @property
    def rays_per_second(self) -> float:
        return self.rays_traced / self.wall_seconds if self.wall_seconds > 0 else 0.0


def render(scene: Scene, cam: Camera, *, spp: Optional[int] = None,
           max_depth: Optional[int] = None, seed: int = 0,
           chunk: Optional[int] = None, sample_offset: int = 0,
           accum: Optional[jnp.ndarray] = None, stats: Optional[RenderStats] = None,
           differentiable: bool = False, sync: bool = True,
           mega_mode: Optional[str] = None):
    """Render ``spp`` samples/pixel; returns the accumulation buffer
    [H, W, 3] of *summed* radiance (divide by spp via film.tonemap).

    ``sample_offset`` starts sampling at a given global sample index so
    progressive / resumed renders continue the same RNG streams.
    ``differentiable=True`` keeps the gradient-bearing material/texture
    path on TPU (plain renders use faster detached attribute kernels; on
    CPU everything is differentiable regardless).
    ``sync=False`` skips the final block_until_ready: the device tunnel
    charges ~28 ms per host<->device roundtrip, so callers that
    materialize the result themselves (bench.py, chained passes) should
    not pay a second one here.  Wall-clock stats are only recorded when
    ``sync`` is true.
    """
    spp = cam.samples_per_pixel if spp is None else spp
    max_depth = cam.max_depth if max_depth is None else max_depth
    w, h = cam.image_width, cam.image_height
    n_pixels = w * h
    _, _, n_virt = ray_layout(w, h, scene_tiled(scene))
    if chunk is None:
        chunk = pick_chunk_size(scene)
        # Never launch (much) more than the job itself.
        chunk = min(chunk, max(1024, -(-n_virt * spp // 1024) * 1024))
    if chunk >= n_virt:
        # Round to whole samples: chunks then start on sample boundaries
        # (start = sample_offset * n_virt is one; increments keep it), so
        # _render_chunk accumulates by reshape+sum instead of a
        # chunk-sized scatter-add.
        chunk = min(chunk // n_virt, max(spp, 1)) * n_virt

    flat = (
        jnp.zeros((n_pixels, 3), jnp.float32)
        if accum is None
        else jnp.asarray(accum, jnp.float32).reshape(n_pixels, 3)
    )

    # Virtual stream window: samples [sample_offset, sample_offset + spp).
    # The chunk kernel sees a logical spp' = sample_offset + spp and we skip
    # the first sample_offset * n_virt (bucket-tiled, padded) rays.
    logical_spp = sample_offset + spp
    start = sample_offset * n_virt
    total = logical_spp * n_virt

    # Megakernel dispatch decided OUTSIDE the jit so it participates in
    # the compilation-cache key (env flags / INTERPRET flips retrace).
    # ``mega_mode`` overrides the choice (A/B experiments, forced modes).
    if mega_mode is None:
        cam_d = dataclasses.replace(cam, max_depth=max_depth)
        mega_mode = wavefront.choose_mega_mode(
            scene, cam_d, chunk, differentiable
        )

    t0 = time.perf_counter()
    pos = start
    n_chunks = 0
    overflow = jnp.int32(0)
    while pos < total:
        flat, ovf = _render_chunk(
            scene, cam, flat, jnp.uint32(pos), seed,
            spp=logical_spp, chunk=chunk, max_depth=max_depth,
            differentiable=differentiable, mega_mode=mega_mode,
        )
        overflow = overflow + ovf
        pos += chunk
        n_chunks += 1
    if sync and hasattr(flat, "block_until_ready"):  # absent under grad tracing
        flat.block_until_ready()
    dt = time.perf_counter() - t0

    if stats is not None:
        stats.rays_traced += total - start
        if sync:
            stats.wall_seconds += dt
        stats.chunks += n_chunks
        try:
            stats.mesh_overflow += int(overflow)
        except (TypeError, jax.errors.TracerIntegerConversionError):
            pass  # under jax.grad tracing the count isn't concrete
    return flat.reshape(h, w, 3)


def render_image(scene: Scene, cam: Camera, *, spp: Optional[int] = None,
                 max_depth: Optional[int] = None, seed: int = 0,
                 chunk: Optional[int] = None, stats: Optional[RenderStats] = None):
    """Render and tonemap to [H, W, 3] floats in [0, 0.999]."""
    spp_eff = cam.samples_per_pixel if spp is None else spp
    accum = render(
        scene, cam, spp=spp_eff, max_depth=max_depth, seed=seed, chunk=chunk,
        stats=stats,
    )
    return film.tonemap(accum, spp_eff)


PROGRESSIVE_PASSES = "preview", "refining", "final"


def render_progressive(scene: Scene, cam: Camera, *, seed: int = 0,
                       callback=None):
    """V-Ray-style progressive schedule mirroring renderPass
    (rt/bucket_renderer.go:170-191): preview = 1 SPP / depth 3, refine =
    spp/4 / depth/2, final = full quality.  Like the reference, each pass
    renders afresh and replaces the displayed image (the final image is the
    full-quality pass alone).  Yields (pass_name, image01) tuples."""
    spp = cam.samples_per_pixel
    schedule = [
        ("preview", 1, 3),                                     # :177-180
        ("refining", max(spp // 4, 1), max(cam.max_depth // 2, 1)),  # :181-185
        ("final", spp, cam.max_depth),                          # :186-190
    ]
    for name, n, depth in schedule:
        img = render_image(scene, cam, spp=n, max_depth=depth, seed=seed)
        if callback is not None:
            callback(name, img)
        yield name, img
