"""Multi-host (pod-slice) initialization and scaling harness.

The reference is single-process (SURVEY.md §2.9); the TPU build scales
across hosts with ``jax.distributed`` + a global mesh: every host feeds
its local chips, rays are sharded over the global 'rays' axis (ICI within
a slice, DCN across hosts for the final framebuffer psum), and the scene
is replicated.

This module is exercised on a single host via
``--xla_force_host_platform_device_count``; real multi-host runs need a
pod slice (coordinator address via env or args).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax

from ..camera import Camera
from ..geometry.scene import Scene
from . import sharding


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize jax.distributed for a multi-host run. No-op when the
    environment provides the config (GKE/TPU VM metadata)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def scaling_report(scene: Scene, cam: Camera, *, spp: int = 8, seed: int = 0,
                   device_counts=None, mode: str = "strong"):
    """Measure rays/s at 1, 2, ..., N devices and report scaling
    efficiency (the BASELINE 1->N-host metric, run per-chip here).

    mode="strong": fixed total work (W*H*spp rays) split over N devices —
    efficiency = rays/s / (N * single-device rays/s).  Small workloads
    hit the per-launch floor and under-read.
    mode="weak": fixed work PER DEVICE (spp scales with N; rays = base*N)
    — efficiency = t_1 / t_N, the honest measure of communication +
    imbalance overhead since per-device compute is constant.
    """
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8) if n <= len(all_devices)]
    results = []
    for n in device_counts:
        mesh = sharding.make_mesh(n)
        spp_n = spp * n if mode == "weak" else spp
        n_rays = cam.image_width * cam.image_height * spp_n
        # compile
        sharding.render_sharded(scene, cam, mesh, np.uint32(seed), spp=spp_n
                                ).block_until_ready()
        t0 = time.perf_counter()
        sharding.render_sharded(scene, cam, mesh, np.uint32(seed + 1),
                                spp=spp_n).block_until_ready()
        dt = time.perf_counter() - t0
        results.append(dict(devices=n, spp=spp_n, wall_s=dt,
                            rays_per_s=n_rays / dt))
    if mode == "weak":
        base_t = results[0]["wall_s"]
        for r in results:
            r["efficiency"] = base_t / r["wall_s"]
    else:
        base = results[0]["rays_per_s"]
        for r in results:
            r["efficiency"] = r["rays_per_s"] / (base * r["devices"])
    return results


def comm_analysis(scene: Scene, cam: Camera, *, spp: int = 100,
                  n_devices: int = 4,
                  chip_mrays_fwd: float = 100.0,
                  chip_mrays_fwd_bwd: float = 20.0,
                  ici_gbps: float = 180.0, dcn_gbps: float = 25.0):
    """Communication-volume model for the sharded render / train step.

    The parallel pattern (parallel/sharding.py) is data parallelism over
    rays with the scene replicated; per launch the ONLY collectives are
      (a) one psum of the partial framebuffer  [W*H, 3] f32,
      (b) (train_step) one psum of the parameter grads (table-sized).
    A ring all-reduce moves 2(N-1)/N x bytes per device, so predicted
    efficiency = compute / (compute + comm).  Numbers here use the
    MEASURED single-chip rates passed in (bench.py) and published v5e
    link bandwidths; the point is that the collective payload is
    megabytes against tens of milliseconds of compute — the >=80%
    BASELINE target has ~100x headroom on ICI and ~15x on DCN.
    """
    n_pix = cam.image_width * cam.image_height
    fb_bytes = n_pix * 3 * 4
    grad_bytes = sum(
        int(np.prod(np.shape(x))) * 4
        for x in sharding.trainable_params(scene).values()
    )
    n_rays = n_pix * spp
    per_dev_fwd_s = n_rays / n_devices / (chip_mrays_fwd * 1e6)
    per_dev_fb_s = n_rays / n_devices / (chip_mrays_fwd_bwd * 1e6)
    ring = 2 * (n_devices - 1) / n_devices

    def eff(compute_s, payload, gbps):
        comm_s = ring * payload / (gbps * 1e9)
        return dict(
            compute_s=round(compute_s, 6),
            comm_s=round(comm_s, 6),
            predicted_efficiency=round(compute_s / (compute_s + comm_s), 6),
        )

    return dict(
        n_devices=n_devices,
        framebuffer_psum_bytes=fb_bytes,
        grad_psum_bytes=grad_bytes,
        assumed_chip_mrays=dict(forward=chip_mrays_fwd,
                                fwd_bwd=chip_mrays_fwd_bwd),
        link_gbps=dict(ici=ici_gbps, dcn=dcn_gbps),
        render_ici=eff(per_dev_fwd_s, fb_bytes, ici_gbps),
        render_dcn=eff(per_dev_fwd_s, fb_bytes, dcn_gbps),
        train_ici=eff(per_dev_fb_s, fb_bytes + grad_bytes, ici_gbps),
        train_dcn=eff(per_dev_fb_s, fb_bytes + grad_bytes, dcn_gbps),
    )
