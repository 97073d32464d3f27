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
                   device_counts=None):
    """Measure rays/s at 1, 2, ..., N devices and report scaling efficiency
    (the BASELINE 1->N-host metric, run per-chip here)."""
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8) if n <= len(all_devices)]
    n_rays = cam.image_width * cam.image_height * spp
    results = []
    for n in device_counts:
        mesh = sharding.make_mesh(n)
        # compile
        sharding.render_sharded(scene, cam, mesh, np.uint32(seed), spp=spp
                                ).block_until_ready()
        t0 = time.perf_counter()
        sharding.render_sharded(scene, cam, mesh, np.uint32(seed + 1), spp=spp
                                ).block_until_ready()
        dt = time.perf_counter() - t0
        results.append(dict(devices=n, wall_s=dt, rays_per_s=n_rays / dt))
    base = results[0]["rays_per_s"]
    for r in results:
        r["efficiency"] = r["rays_per_s"] / (base * r["devices"])
    return results
