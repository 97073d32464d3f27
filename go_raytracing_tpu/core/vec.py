"""Vector math core for the TPU path tracer.

TPU-native counterpart of the reference's math layer (``rt/vec3.go``,
``rt/ray.go``).  Instead of a ``Vec3`` struct, every "vector" here is a jnp
array whose *last* axis has size 3, so all operations are batched over
arbitrary leading axes (the ray megabatch).  Rays are not a class either:
they are ``(origin, direction, time)`` array triples carried through the
wavefront loop as structure-of-arrays.

Reference parity notes (cited file:line are into /root/reference):
  - ``reflect``    — rt/vec3.go:106-108
  - ``refract``    — rt/vec3.go:110-117
  - ``unit``       — rt/vec3.go:32-39 (returns v unchanged when |v| == 0)
  - ``near_zero``  — rt/vec3.go:41-44 (1e-8 per-component threshold)
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_PARALLEL = 1e-8    # ray-parallel-to-plane epsilon (rt/quad.go:48, rt/plane.go:28)
EPS_HIT = 1e-3         # self-intersection epsilon   (rt/camera.go:451)
NEAR_ZERO = 1e-8       # degenerate-scatter epsilon  (rt/vec3.go:42)


def dot(a, b):
    """Batched dot product over the trailing size-3 axis."""
    return jnp.sum(a * b, axis=-1)


def vdot(a, b):
    """Like :func:`dot` but keeps the trailing axis (shape ``[..., 1]``)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_squared(v))


def unit(v):
    """Normalize; a zero vector is returned unchanged (rt/vec3.go:32-39)."""
    l2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return jnp.where(l2 > 0, v * jax_rsqrt_safe(l2), v)


def jax_rsqrt_safe(x):
    """1/sqrt(x) that never divides by zero (callers mask the x==0 lanes)."""
    return jnp.where(x > 0, 1.0 / jnp.sqrt(jnp.where(x > 0, x, 1.0)), 0.0)


def near_zero(v):
    """True where all three components are < 1e-8 in magnitude."""
    return jnp.all(jnp.abs(v) < NEAR_ZERO, axis=-1)


def reflect(v, n):
    """Mirror reflection of ``v`` about normal ``n`` (rt/vec3.go:106-108)."""
    return v - 2.0 * vdot(v, n) * n


def refract(uv, n, etai_over_etat):
    """Snell refraction (rt/vec3.go:110-117).

    ``uv`` must be unit length; ``etai_over_etat`` broadcasts over the batch
    (shape ``[...]`` or ``[..., 1]``).
    """
    if jnp.ndim(etai_over_etat) and etai_over_etat.shape[-1:] != (1,):
        etai_over_etat = etai_over_etat[..., None]
    cos_theta = jnp.minimum(vdot(-uv, n), 1.0)
    r_out_perp = etai_over_etat * (uv + cos_theta * n)
    # max() keeps sqrt' finite at the TIR boundary (backward-pass safety);
    # forward difference is < 1e-10.
    r_out_parallel = -jnp.sqrt(
        jnp.maximum(
            jnp.abs(1.0 - jnp.sum(r_out_perp * r_out_perp, axis=-1, keepdims=True)),
            1e-20,
        )
    ) * n
    return r_out_perp + r_out_parallel


def ray_at(origin, direction, t):
    """Point along a ray: ``origin + t * direction`` (rt/ray.go:22-24)."""
    return origin + t[..., None] * direction
