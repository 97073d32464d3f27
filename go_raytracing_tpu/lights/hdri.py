"""HDRI environment maps with luminance importance sampling.

TPU-native counterpart of rt/hdri.go.  The CDF build (rt/hdri.go:145-224)
is fully vectorized host-side NumPy; render-time sampling replaces the
per-call binary search (rt/hdri.go:300-322) with a fixed-iteration,
batch-parallel bisection that performs O(log W) single-element gathers per
ray instead of materializing [R, W] row slices.

Parity notes:
  - equirect mapping: phi = atan2(z, x), theta = asin(y), u = 0.5 + phi/2pi
    (+ rotation, wrapped), v = 0.5 - theta/pi (rt/hdri.go:75-113).
  - per-pixel weight = Rec.709 luminance * sin(theta) where sin(theta) is
    cos(elevation) (rt/hdri.go:163-193).
  - solid-angle PDF = pdf[px] * W * H / (2 pi^2 sin(theta)), floored at
    1e-10 (rt/hdri.go:262-297).
  - SampleDirection returns the *nearest* texel as emission while Sample
    (the miss shader) is bilinear with horizontal wrap / vertical clamp
    (rt/hdri.go:120-128, rt/image_loader.go:398-436).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core import vec

TWO_PI = 2.0 * np.pi


class Environment(NamedTuple):
    data: jnp.ndarray             # [H, W, 3] linear radiance
    rotation: jnp.ndarray         # scalar radians
    pdf: jnp.ndarray              # [H, W] normalized pixel pdf (lum * sin, / power)
    marginal_cdf: jnp.ndarray     # [H + 1]
    conditional_cdf: jnp.ndarray  # [H, W + 1]
    total_power: jnp.ndarray      # scalar


def build_environment(data: np.ndarray, rotation_degrees: float = 0.0) -> Environment:
    """Build the importance-sampling distribution (rt/hdri.go:145-224)."""
    data = np.asarray(data, np.float32)
    h, w = data.shape[:2]
    v = (np.arange(h, dtype=np.float64) + 0.5) / h
    theta = (0.5 - v) * np.pi
    sin_theta = np.cos(theta)  # elevation convention (rt/hdri.go:169)

    lum = 0.2126 * data[..., 0] + 0.7152 * data[..., 1] + 0.0722 * data[..., 2]
    weight = np.maximum(lum.astype(np.float64) * sin_theta[:, None], 0.0)

    row_sums = weight.sum(axis=1)
    total_power = weight.sum()

    cond = np.zeros((h, w + 1), np.float64)
    np.cumsum(weight, axis=1, out=cond[:, 1:])
    safe_rows = np.where(row_sums > 0, row_sums, 1.0)
    cond /= safe_rows[:, None]

    marg = np.zeros(h + 1, np.float64)
    np.cumsum(row_sums, out=marg[1:])
    if total_power > 0:
        marg /= total_power
        pdf = weight / total_power
    else:
        pdf = weight
    return Environment(
        data=jnp.asarray(data),
        rotation=jnp.float32(np.deg2rad(rotation_degrees)),
        pdf=jnp.asarray(pdf, jnp.float32),
        marginal_cdf=jnp.asarray(marg, jnp.float32),
        conditional_cdf=jnp.asarray(cond, jnp.float32),
        total_power=jnp.float32(total_power),
    )


def direction_to_uv(env: Environment, d):
    """[R,3] directions -> (u, v) in [0,1) (rt/hdri.go:75-94)."""
    du = vec.unit(d)
    phi = jnp.arctan2(du[..., 2], du[..., 0])
    theta = jnp.arcsin(jnp.clip(du[..., 1], -1.0, 1.0))
    u = 0.5 + phi / TWO_PI + env.rotation / TWO_PI
    u = u - jnp.floor(u)
    v = 0.5 - theta / np.pi
    return u, v


def uv_to_direction(env: Environment, u, v):
    """(u, v) -> unit direction (rt/hdri.go:96-113)."""
    u = u - env.rotation / TWO_PI
    u = u - jnp.floor(u)
    phi = (u - 0.5) * TWO_PI
    theta = (0.5 - v) * np.pi
    ct = jnp.cos(theta)
    return jnp.stack([ct * jnp.cos(phi), jnp.sin(theta), ct * jnp.sin(phi)], axis=-1)


def sample(env: Environment, d):
    """Miss-shader radiance for directions d [R,3]: bilinear with horizontal
    wrap and vertical clamp (rt/image_loader.go:399-436)."""
    h, w = env.data.shape[:2]
    u, v = direction_to_uv(env, d)
    px = u * w - 0.5
    py = v * h - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0.astype(px.dtype))[..., None]
    fy = (py - y0.astype(py.dtype))[..., None]
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    c00 = env.data[y0c, x0w]
    c10 = env.data[y0c, x1w]
    c01 = env.data[y1c, x0w]
    c11 = env.data[y1c, x1w]
    c0 = c00 * (1.0 - fx) + c10 * fx
    c1 = c01 * (1.0 - fx) + c11 * fx
    return c0 * (1.0 - fy) + c1 * fy


def _ceil_log2(n: int) -> int:
    k = 0
    while (1 << k) < n:
        k += 1
    return k


def _search_cdf_1d(cdf, xi, n: int):
    """Batched bisection matching searchCDF (rt/hdri.go:300-322):
    find smallest i with cdf[i+1] > xi, clamped to [0, n-1]."""
    lo = jnp.zeros_like(xi, dtype=jnp.int32)
    hi = jnp.full_like(lo, n)
    for _ in range(_ceil_log2(max(n, 1))):
        mid = (lo + hi) // 2
        go_right = cdf[mid + 1] <= xi
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return jnp.clip(lo, 0, n - 1)


def _search_cdf_rows(cdf2d, rows, xi, n: int):
    """Row-indexed bisection over a [H, n+1] CDF table."""
    lo = jnp.zeros_like(xi, dtype=jnp.int32)
    hi = jnp.full_like(lo, n)
    for _ in range(_ceil_log2(max(n, 1))):
        mid = (lo + hi) // 2
        go_right = cdf2d[rows, mid + 1] <= xi
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return jnp.clip(lo, 0, n - 1)


def pdf(env: Environment, d):
    """Solid-angle PDF of sampling direction d (rt/hdri.go:262-297)."""
    h, w = env.data.shape[:2]
    u, v = direction_to_uv(env, d)
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    theta = (0.5 - v) * np.pi
    sin_theta = jnp.maximum(jnp.cos(theta), 1e-10)
    p = env.pdf[y, x] * (w * h) / (2.0 * np.pi * np.pi * sin_theta)
    return jnp.maximum(p, 1e-10)


def sample_direction(env: Environment, xi1, xi2):
    """Importance-sample directions (rt/hdri.go:228-259).

    xi1, xi2: [R] uniforms.  Returns (direction [R,3], emission [R,3]
    (nearest texel), pdf [R]).
    """
    h, w = env.data.shape[:2]
    y = _search_cdf_1d(env.marginal_cdf, xi1, h)
    x = _search_cdf_rows(env.conditional_cdf, y, xi2, w)
    u = (x.astype(jnp.float32) + 0.5) / w
    v = (y.astype(jnp.float32) + 0.5) / h
    d = uv_to_direction(env, u, v)
    emission = env.data[y, x]
    return d, emission, pdf(env, d)


# -----------------------------------------------------------------------------
# Component-SoA variants (hot path; see core/vec3.py for why)
# -----------------------------------------------------------------------------

def _direction_to_uv_soa(env: Environment, d):
    du = d.unit()
    phi = jnp.arctan2(du.z, du.x)
    theta = jnp.arcsin(jnp.clip(du.y, -1.0, 1.0))
    u = 0.5 + phi / TWO_PI + env.rotation / TWO_PI
    u = u - jnp.floor(u)
    v = 0.5 - theta / np.pi
    return u, v


def sample_soa(env: Environment, d):
    """Miss-shader radiance for V3 directions (bilinear, h-wrap/v-clamp)."""
    from ..core.vec3 import V3

    h, w = env.data.shape[:2]
    u, v = _direction_to_uv_soa(env, d)
    px = u * w - 0.5
    py = v * h - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0.astype(px.dtype)
    fy = py - y0.astype(py.dtype)
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)

    def texel(yy, xx):
        return V3(env.data[yy, xx, 0], env.data[yy, xx, 1], env.data[yy, xx, 2])

    c00 = texel(y0c, x0w)
    c10 = texel(y0c, x1w)
    c01 = texel(y1c, x0w)
    c11 = texel(y1c, x1w)
    c0 = c00 * (1.0 - fx) + c10 * fx
    c1 = c01 * (1.0 - fx) + c11 * fx
    return c0 * (1.0 - fy) + c1 * fy


def pdf_soa(env: Environment, d):
    h, w = env.data.shape[:2]
    u, v = _direction_to_uv_soa(env, d)
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    theta = (0.5 - v) * np.pi
    sin_theta = jnp.maximum(jnp.cos(theta), 1e-10)
    p = env.pdf[y, x] * (w * h) / (2.0 * np.pi * np.pi * sin_theta)
    return jnp.maximum(p, 1e-10)


def sample_direction_soa(env: Environment, xi1, xi2):
    """SoA importance sampling: returns (V3 dir, V3 emission, pdf [R])."""
    from ..core.vec3 import V3

    h, w = env.data.shape[:2]
    y = _search_cdf_1d(env.marginal_cdf, xi1, h)
    x = _search_cdf_rows(env.conditional_cdf, y, xi2, w)
    u = (x.astype(jnp.float32) + 0.5) / w
    v = (y.astype(jnp.float32) + 0.5) / h
    # uv -> direction (rt/hdri.go:96-113)
    uu = u - env.rotation / TWO_PI
    uu = uu - jnp.floor(uu)
    phi = (uu - 0.5) * TWO_PI
    theta = (0.5 - v) * np.pi
    ct = jnp.cos(theta)
    d = V3(ct * jnp.cos(phi), jnp.sin(theta), ct * jnp.sin(phi))
    emission = V3(env.data[y, x, 0], env.data[y, x, 1], env.data[y, x, 2])
    return d, emission, pdf_soa(env, d)
