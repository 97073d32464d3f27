"""Wavefront OBJ loading (rt/obj_loader.go:15-113).

Parses ``v`` and ``f`` records only (normals/texcoords ignored, as in the
reference), fan-triangulates n-gons, and supports negative (relative)
indices.  Returns vertices [V,3] and triangle index triples [T,3].

The reference checkout's Lucy OBJs are git-lfs pointer stubs, so
``lucy_standin`` synthesizes a procedural statue-shaped mesh with the same
bounding box (devlog: [-465, -0.025, -267] .. [465, 1597, 267]) for the
CornellBoxLucy scene config.
"""

from __future__ import annotations

import numpy as np


def load_obj(path: str):
    verts: list = []
    tris: list = []
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v" and len(parts) >= 4:
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif parts[0] == "f" and len(parts) >= 4:
                idx = []
                for tok in parts[1:]:
                    s = tok.split("/")[0]
                    i = int(s)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tris.append((idx[0], idx[k], idx[k + 1]))
    if not verts:
        raise ValueError(f"{path}: no vertices (git-lfs stub?)")
    return np.asarray(verts, np.float64), np.asarray(tris, np.int64)


def is_lfs_stub(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(32).startswith(b"version https://git-lfs")
    except OSError:
        return True


def lucy_standin(segments: int = 48, rings: int = 40,
                 roughness: float = 0.0):
    """Procedural lathed 'statue' with Lucy's bounding box.

    A rotationally swept profile (base, body, shoulders, head) produces
    ``segments * (rings - 1) * 2`` triangles — enough to exercise the mesh
    BVH path without the 10.8 MB asset.

    ``roughness`` > 0 displaces vertices radially and vertically with
    deterministic multi-octave sine noise, turning the (maximally
    BVH-friendly) smooth lathe into an irregular surface with folds and
    drapery-like ridges — the tile/cull stress profile of a real scanned
    statue (rt/obj_loader.go:105-112; the real lucy_low.obj is an lfs
    stub in this checkout).  0.35 gives fold depths of ~1/3 the local
    radius without self-intersection of the lathe topology.
    """
    ys = np.linspace(0.0, 1597.0, rings)
    t = ys / 1597.0
    # Profile radius: wide base -> waist -> shoulders -> head.
    profile = (
        380.0 * np.exp(-((t - 0.02) ** 2) / 0.012)
        + 170.0 * np.exp(-((t - 0.45) ** 2) / 0.09)
        + 240.0 * np.exp(-((t - 0.75) ** 2) / 0.02)
        + 90.0 * np.exp(-((t - 0.95) ** 2) / 0.004)
        + 20.0
    )
    profile = np.minimum(profile, 465.0)
    ang = np.linspace(0.0, 2 * np.pi, segments, endpoint=False)
    rad = np.broadcast_to(profile[:, None], (rings, segments)).copy()
    yy = np.broadcast_to(ys[:, None], rad.shape).copy()
    if roughness > 0.0:
        th = np.broadcast_to(ang[None, :], rad.shape)
        tv = np.broadcast_to(t[:, None], rad.shape)
        # Deterministic fBm-ish displacement: incommensurate sine
        # octaves in (angle, height) — vertical folds + diagonal ridges.
        disp = (
            0.50 * np.sin(7.0 * th + 23.0 * tv)
            + 0.30 * np.sin(13.0 * th - 41.0 * tv + 1.7)
            + 0.15 * np.sin(29.0 * th + 83.0 * tv + 0.6)
            + 0.05 * np.sin(61.0 * th - 167.0 * tv + 2.9)
        )
        rad = rad * (1.0 + roughness * disp)
        yy = yy + roughness * 40.0 * np.sin(11.0 * th + 31.0 * tv)
    # Slightly elliptical (x wider than z), like the statue's silhouette.
    vx = rad * np.cos(ang)[None, :]
    vz = rad * np.sin(ang)[None, :] * 0.55
    verts = np.stack([vx, yy, vz], axis=-1).reshape(-1, 3)

    tris = []
    for r in range(rings - 1):
        for s in range(segments):
            a = r * segments + s
            b = r * segments + (s + 1) % segments
            c = (r + 1) * segments + s
            d = (r + 1) * segments + (s + 1) % segments
            tris.append((a, b, c))
            tris.append((b, d, c))
    return verts, np.asarray(tris, np.int64)


def load_obj_or_standin(path: str):
    """Load an OBJ, falling back to the procedural stand-in for lfs stubs."""
    import os

    if os.path.isfile(path) and not is_lfs_stub(path):
        return load_obj(path)
    return lucy_standin()
