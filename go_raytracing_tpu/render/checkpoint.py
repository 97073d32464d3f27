"""Checkpoint / resume for long renders.

The reference has no resumable state — each progressive pass re-renders
from scratch (rt/bucket_renderer.go:170-191, SURVEY.md §5).  Here the
counter-based RNG makes SPP-chunked checkpointing exact: the accumulation
buffer plus the number of completed samples fully determine resumption
(sample_offset continues the same RNG streams), so a resumed render is
bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..camera import Camera
from ..geometry.scene import Scene
from . import renderer


def save(path: str, accum, samples_done: int, seed: int, cam: Camera):
    """Save a render checkpoint (accumulator + progress metadata)."""
    meta = dict(
        samples_done=int(samples_done),
        seed=int(seed),
        image_width=cam.image_width,
        image_height=cam.image_height,
    )
    np.savez_compressed(
        path, accum=np.asarray(accum), meta=json.dumps(meta)
    )


def load(path: str):
    """Load a checkpoint -> (accum [H,W,3], samples_done, seed)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    return (
        jnp.asarray(z["accum"]),
        meta["samples_done"],
        meta["seed"],
    )


def render_with_checkpoints(
    scene: Scene,
    cam: Camera,
    path: str,
    *,
    spp: Optional[int] = None,
    seed: int = 0,
    spp_per_checkpoint: int = 16,
    stats: Optional[renderer.RenderStats] = None,
):
    """Render in SPP chunks, checkpointing after each; resumes from ``path``
    if it exists.  Returns the final accumulation buffer [H, W, 3]."""
    spp = cam.samples_per_pixel if spp is None else spp
    accum = None
    done = 0
    if os.path.exists(path):
        accum, done, saved_seed = load(path)
        if saved_seed != seed:
            raise ValueError(
                f"checkpoint {path} was rendered with seed {saved_seed}, not {seed}"
            )
    while done < spp:
        n = min(spp_per_checkpoint, spp - done)
        accum = renderer.render(
            scene, cam, spp=n, seed=seed, sample_offset=done, accum=accum,
            stats=stats,
        )
        done += n
        save(path, accum, done, seed, cam)
    return accum
