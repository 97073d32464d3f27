"""HDRI environment maps with luminance importance sampling.

TPU-native counterpart of rt/hdri.go.  The distribution build
(rt/hdri.go:145-224) is fully vectorized host-side NumPy; render-time
sampling replaces the per-call binary search (rt/hdri.go:300-322) with a
Walker ALIAS TABLE over the flattened pixel grid: 2 gathers per sample
instead of ~21 serial bisection gathers (each latency-bound at ~12 ns on
TPU).  The pdf table stores the alias table's exactly-encoded density,
so MIS weights and unbiasedness are exact.  The batched bisection
(_search_cdf_*) is retained as the semantic reference for searchCDF.

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
import jax
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
    alias_idx: jnp.ndarray        # [H * W] i32 alias cell (Walker table)
    alias_cut: jnp.ndarray        # [H * W] f32 keep-own-cell threshold


def _build_alias(weight: np.ndarray):
    """Walker alias table for the flattened pixel distribution, built
    vectorized: larges' excess mass (cumsum E) is matched to smalls'
    deficit mass (cumsum D) with one searchsorted.  A small whose deficit
    interval straddles two larges gets a single donor anyway (the alias
    format allows only one), so the encoded distribution q differs from
    the target by at most two boundary deficits per large; we therefore
    RETURN q and use it as the pdf table, keeping the estimator exactly
    unbiased (pdf used in MIS == true sampling density).

    Returns (alias_idx [N] i32, alias_cut [N] f32, q [H, W] f64 summing
    to 1).  Replaces the per-sample CDF bisection (rt/hdri.go:300-322):
    O(log H + log W) serial gathers per ray (~21 at 2048x1024, each
    latency-bound on TPU) become 2.
    """
    h, w = weight.shape
    n = h * w
    p = weight.reshape(-1).astype(np.float64)
    total = p.sum()
    if total <= 0 or n == 0:
        return (
            np.arange(max(n, 1), dtype=np.int32)[:n],
            np.ones(n, np.float32),
            np.zeros((h, w), np.float64),
        )
    scaled = p * (n / total)  # mean 1
    cut = np.minimum(scaled, 1.0)
    alias = np.arange(n, dtype=np.int64)
    small = scaled < 1.0
    idx_s = np.nonzero(small)[0]
    idx_l = np.nonzero(~small)[0]
    if len(idx_s) and len(idx_l):
        deficit = 1.0 - scaled[idx_s]
        excess = scaled[idx_l] - 1.0
        donor = np.searchsorted(np.cumsum(excess), np.cumsum(deficit) - 1e-12)
        alias[idx_s] = idx_l[np.minimum(donor, len(idx_l) - 1)]
    # exact encoded distribution: own retained mass + donated-in mass
    q = cut.copy()
    np.add.at(q, alias[idx_s], 1.0 - scaled[idx_s])
    q /= n
    return alias.astype(np.int32), cut.astype(np.float32), q.reshape(h, w)


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
    alias_idx, alias_cut, q = _build_alias(weight)
    if total_power > 0:
        marg /= total_power
        pdf = q  # sampling density actually encoded by the alias table
    else:
        pdf = weight
    return Environment(
        data=jnp.asarray(data),
        rotation=jnp.float32(np.deg2rad(rotation_degrees)),
        pdf=jnp.asarray(pdf, jnp.float32),
        marginal_cdf=jnp.asarray(marg, jnp.float32),
        conditional_cdf=jnp.asarray(cond, jnp.float32),
        total_power=jnp.float32(total_power),
        alias_idx=jnp.asarray(alias_idx),
        alias_cut=jnp.asarray(alias_cut),
    )


def quad_table(data: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] -> [H*W, 12] table of 2x2 bilinear footprints
    (c00 c10 c01 c11) with horizontal wrap / vertical clamp baked in.

    Built INSIDE the trace from ``Environment.data`` so gradients flow to
    the texels (d(render)/d(env) — the miss shader must see env.data as a
    *live* texture, rt/hdri.go:120-128).  Construction is slices/concat
    only (no gathers): one extra [H*W,12] materialization per chunk, ~25MB
    for a 1k HDRI — negligible vs the 4 per-ray row gathers it replaces
    (~102 ms per 4M-ray chunk, scripts/slow_probe.py)."""
    h, w = data.shape[:2]
    dx = jnp.roll(data, -1, axis=1)                       # x+1, wrap
    dy = jnp.concatenate([data[1:], data[-1:]], axis=0)   # y+1, clamp
    dxy = jnp.roll(dy, -1, axis=1)
    return jnp.concatenate([data, dx, dy, dxy], axis=2).reshape(h * w, 12)


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


def _alias_pick(env: Environment, xi1, xi2):
    """Pick a pixel from the alias table: 2 gathers instead of the
    O(log H + log W) bisection gathers of searchCDF (rt/hdri.go:300-322).
    Same distribution (env.pdf IS the table's encoded density)."""
    h, w = env.data.shape[:2]
    n = h * w
    cell = jnp.minimum((xi1 * n).astype(jnp.int32), n - 1)
    keep = xi2 < env.alias_cut[cell]
    chosen = jnp.where(keep, cell, env.alias_idx[cell])
    return chosen // w, chosen % w


def sample_direction(env: Environment, xi1, xi2):
    """Importance-sample directions (rt/hdri.go:228-259).

    xi1, xi2: [R] uniforms.  Returns (direction [R,3], emission [R,3]
    (nearest texel), pdf [R]).
    """
    h, w = env.data.shape[:2]
    y, x = _alias_pick(env, xi1, xi2)
    u = (x.astype(jnp.float32) + 0.5) / w
    v = (y.astype(jnp.float32) + 0.5) / h
    d = uv_to_direction(env, u, v)
    emission = env.data[y, x]
    theta = (0.5 - v) * np.pi
    sin_theta = jnp.maximum(jnp.cos(theta), 1e-10)
    p = env.pdf[y, x] * (w * h) / (2.0 * np.pi * np.pi * sin_theta)
    return d, emission, jnp.maximum(p, 1e-10)


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


def miss_footprint(env: Environment, d):
    """(fx, fy, base texel id) of the bilinear miss fetch for V3
    directions — the shared index math of sample_soa / miss_texel_grad
    / the two-phase env carry (top-edge fy collapse included)."""
    h, w = env.data.shape[:2]
    u, v = _direction_to_uv_soa(env, d)
    px = u * w - 0.5
    py = v * h - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0.astype(px.dtype)
    fy = py - y0.astype(py.dtype)
    x0w = jnp.mod(x0, w)
    y0c = jnp.clip(y0, 0, h - 1)
    # Top edge: y0 = -1 clamps BOTH bilinear rows to row 0, but the quad
    # at base row 0 holds rows (0, 1) — collapse the blend to row 0.
    fy = jnp.where(y0 < 0, 0.0, fy)
    return fx, fy, y0c * w + x0w


def blend_quad(qcols, fx, fy):
    """Bilinear blend of the 12 footprint columns (c00 c10 c01 c11 x
    rgb) -> V3.  qcols: sequence of 12 [R] arrays (component SoA)."""
    from ..core.vec3 import V3

    c00 = V3(qcols[0], qcols[1], qcols[2])
    c10 = V3(qcols[3], qcols[4], qcols[5])
    c01 = V3(qcols[6], qcols[7], qcols[8])
    c11 = V3(qcols[9], qcols[10], qcols[11])
    c0 = c00 * (1.0 - fx) + c10 * fx
    c1 = c01 * (1.0 - fx) + c11 * fx
    return c0 * (1.0 - fy) + c1 * fy


def sample_soa(env: Environment, d):
    """Miss-shader radiance for V3 directions (bilinear, h-wrap/v-clamp,
    rt/image_loader.go:399-431).

    ONE [R, 12] row gather of the 2x2-footprint table fetches all four
    texels: gathers are latency-bound per LOOKUP (~6 ns), so the previous
    four [R, 3] row gathers cost ~102 ms per 4M-ray chunk
    (scripts/slow_probe.py, hdri-test).  The table is derived from
    env.data in-trace (quad_table) so texel gradients flow."""
    fx, fy, base = miss_footprint(env, d)
    q = quad_table(env.data)[base]  # [R, 12]: c00 c10 c01 c11
    return blend_quad([q[:, j] for j in range(12)], fx, fy)


def miss_texel_grad(env: Environment, d, lam):
    """Exact d<lam, sample_soa(env, d)>/d(env.data) WITHOUT the per-ray
    row scatter.

    The autodiff backward of :func:`sample_soa` is a [R, 12] scatter-add
    into the quad table — ~75 ns per update row on TPU (~307 ms per 4M
    chunk, the hdri-fwd-bwd wall; DESIGN.md 7a).  Here the bilinear
    footprint cotangent rows are reduced per BASE TEXEL first
    (core.segsum.rows_segment_sum: sort + segmented pairwise scan, no
    global-prefix cancellation) and the resulting [H*W, 12] quad-table
    cotangent is pushed through the quad_table transpose (jax.vjp —
    slices/rolls, no scatter).  Matches jax.grad of
    sum(lam * sample_soa) at f32 tolerance (tests/test_hdri.py).

    d: V3 directions (dummy values fine where lam == 0).
    lam: V3 per-ray radiance cotangent (zero on non-miss lanes).
    """
    from ..core.segsum import cols_segment_sum_factored

    h, w = env.data.shape[:2]
    fx, fy, base = miss_footprint(env, d)

    # the 12 product columns (4 bilinear weights x 3 channels) ride the
    # sort FACTORED as 5 primitives (~2 ms/operand, segsum.py)
    def expand(fx_, fy_, lx_, ly_, lz_):
        w00 = (1.0 - fx_) * (1.0 - fy_)
        w10 = fx_ * (1.0 - fy_)
        w01 = (1.0 - fx_) * fy_
        w11 = fx_ * fy_
        return [wgt * ch for wgt in (w00, w10, w01, w11)
                for ch in (lx_, ly_, lz_)]

    qcot = cols_segment_sum_factored(
        base, (fx, fy, lam.x, lam.y, lam.z), expand, h * w)
    _, vjp = jax.vjp(quad_table, env.data)
    return vjp(qcot)[0]


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
    y, x = _alias_pick(env, xi1, xi2)
    u = (x.astype(jnp.float32) + 0.5) / w
    v = (y.astype(jnp.float32) + 0.5) / h
    # uv -> direction (rt/hdri.go:96-113)
    uu = u - env.rotation / TWO_PI
    uu = uu - jnp.floor(uu)
    phi = (uu - 0.5) * TWO_PI
    theta = (0.5 - v) * np.pi
    ct = jnp.cos(theta)
    d = V3(ct * jnp.cos(phi), jnp.sin(theta), ct * jnp.sin(phi))
    em = env.data.reshape(h * w, 3)[y * w + x]  # one row gather, not 3
    emission = V3(em[:, 0], em[:, 1], em[:, 2])
    sin_theta = jnp.maximum(ct, 1e-10)
    p = env.pdf[y, x] * (w * h) / (2.0 * np.pi * np.pi * sin_theta)
    return d, emission, jnp.maximum(p, 1e-10)
