"""Counter-based RNG for the wavefront path tracer.

The reference uses the global ``math/rand`` generator everywhere
(rt/utils.go:18-28), which makes its renders nondeterministic across runs
and across goroutine schedules.  A TPU wavefront renderer needs the
opposite: every random draw must be a pure function of *which* draw it is,
so that (a) forward and backward replays are identical, (b) resharding the
ray megabatch across chips does not change the image, and (c) SPP-chunked /
checkpointed renders compose deterministically.

We therefore key every draw by an integer tuple::

    (seed, stream, bounce, purpose)

where ``stream`` is the global ray counter ``pixel_index * spp + sample``,
``bounce`` is the wavefront iteration, and ``purpose`` enumerates the draw
site (jitter-x, ray-time, scatter-u, ...).  The hash is PCG3D (Jarzynski &
Olano, "Hash Functions for GPU Rendering", JCGT 2020) — 3 in / 3 out,
~20 integer VPU ops, no tables, no state; far cheaper than running full
threefry per draw and amply good for Monte Carlo rendering.

Rejection samplers in the reference (``RandomUnitVector`` rt/vec3.go:45-54,
``RandomInUnitDisk`` rt/vec3.go:66-77) become closed-form inverse-CDF
samplers with *identical distributions* (uniform on the sphere / disk) —
data-dependent retry loops do not exist under XLA.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Draw-purpose enumeration.  Each wavefront bounce consumes a disjoint set
# of purposes; adding new ones at the end keeps old renders reproducible.
JITTER_X = 0
JITTER_Y = 1
RAY_TIME = 2
DEFOCUS_R = 3
DEFOCUS_PHI = 4
SCATTER_U = 5
SCATTER_V = 6
FRESNEL = 7
LIGHT_PICK = 8
LIGHT_U = 9
LIGHT_V = 10
VOLUME_FLIGHT = 11
HDRI_ROW = 12
HDRI_COL = 13

_M = np.uint32(1664525)
_A = np.uint32(1013904223)


def _pcg3d(x, y, z):
    """PCG3D hash: three uint32 in, three decorrelated uint32 out."""
    x = x * _M + _A
    y = y * _M + _A
    z = z * _M + _A
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


def _to_unit_float(bits):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (bits >> np.uint32(8)).astype(jnp.float32) * np.float32(2.0 ** -24)


def uniform3(seed, stream, bounce, purpose):
    """Three independent U[0,1) floats for (seed, stream, bounce, purpose).

    ``stream`` is a uint32/int32 array (the ray counter); ``seed``,
    ``bounce`` and ``purpose`` are python ints or scalar arrays.  Returns
    three float32 arrays shaped like ``stream``.
    """
    stream = jnp.asarray(stream).astype(jnp.uint32)
    bounce = jnp.asarray(bounce).astype(jnp.uint32)
    purpose = jnp.asarray(purpose).astype(jnp.uint32)
    a = stream ^ (jnp.uint32(seed) * jnp.uint32(0x9E3779B9))
    b = bounce * jnp.uint32(0x85EBCA6B) ^ jnp.uint32(seed)
    c = purpose * jnp.uint32(0xC2B2AE35) + jnp.uint32(0x27D4EB2F)
    a, b, c = jnp.broadcast_arrays(a, b, c)
    x, y, z = _pcg3d(a, b, c)
    return _to_unit_float(x), _to_unit_float(y), _to_unit_float(z)


def uniform(seed, stream, bounce, purpose):
    """One U[0,1) float32 per stream element."""
    return uniform3(seed, stream, bounce, purpose)[0]


def uniform2(seed, stream, bounce, purpose):
    """Two U[0,1) float32s per stream element."""
    x, y, _ = uniform3(seed, stream, bounce, purpose)
    return x, y


# -----------------------------------------------------------------------------
# Distribution samplers (closed-form; same distributions as the reference's
# rejection loops).
# -----------------------------------------------------------------------------

def unit_vector_from_uniforms(u1, u2):
    """Uniform direction on the unit sphere (== RandomUnitVector output
    distribution, rt/vec3.go:45-54) via inverse-CDF: z ~ U[-1,1],
    phi ~ U[0,2pi)."""
    z = 1.0 - 2.0 * u1
    phi = (2.0 * np.pi) * u2
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def in_unit_disk_from_uniforms(u1, u2):
    """Uniform point in the unit disk (== RandomInUnitDisk distribution,
    rt/vec3.go:66-77): r = sqrt(u), theta ~ U[0,2pi)."""
    r = jnp.sqrt(u1)
    theta = (2.0 * np.pi) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def random_unit_vector(seed, stream, bounce, purpose=SCATTER_U):
    u1, u2, _ = uniform3(seed, stream, bounce, purpose)
    return unit_vector_from_uniforms(u1, u2)
