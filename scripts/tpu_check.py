"""TPU regression artifact: renders the golden suite + FD gradient checks
ON THE REAL CHIP and writes TPU_CHECK_r{N}.json comparing against the
CPU-generated goldens (VERDICT round-1 item 8: TPU correctness evidence
must be a committed artifact, not commit-message lore).

Run: python scripts/tpu_check.py [round_tag]
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import go_raytracing_tpu as grt

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")
# Same cases as tests/test_golden.py (keep in sync).
CASES = [
    ("simple", 32, 4, 6),
    ("cornell", 32, 4, 5),
    ("quads", 32, 4, 4),
    ("checker", 32, 4, 4),
    ("cornell-smoke", 24, 4, 5),
    ("glossy-metal", 24, 4, 5),
    ("perlin", 24, 2, 4),
    ("cornell-lucy", 24, 2, 4),  # mesh kernel path on the real chip
    ("earth", 24, 2, 5),         # image-texture 'image' mega mode
    ("hdri-test", 24, 2, 5),     # env miss shader + specular chain
    # round-5 coverage closes (VERDICT r4 #7):
    ("random", 24, 2, 4),          # motion blur + 485-sphere ensemble
    ("primitives", 24, 2, 4),      # pyramid / triangle / circle compounds
    ("cornell-glossy", 24, 2, 5),  # metal+dielectric cornell
]


def golden_compare():
    out = {}
    for name, width, spp, depth in CASES:
        scene, cam = grt.load_scene(name)
        cam = dataclasses.replace(
            cam, image_width=width, samples_per_pixel=spp, max_depth=depth
        )
        img = np.asarray(grt.render_image(scene, cam, spp=spp, seed=11))
        want = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))[
            "img"].astype(np.float32)
        mae = float(np.abs(img - want).mean())
        frac = float((np.abs(img - want) > 0.05).mean())
        out[name] = dict(mae=round(mae, 6), frac_off=round(frac, 6),
                         ok=bool(mae < 5e-3 and frac < 0.01))
        print(f"golden {name:14s} mae={mae:.5f} frac_off={frac:.4f} "
              f"ok={out[name]['ok']}", flush=True)
    return out


def fd_gradcheck():
    """Albedo FD check on TPU: d(mean radiance)/d(albedo.x) of the simple
    scene's diffuse sphere vs central finite differences (the same
    contract as tests/test_gradients.py, but on the chip)."""
    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.integrator import wavefront

    scene, cam = grt.load_scene("simple")
    cam = dataclasses.replace(cam, image_width=24, samples_per_pixel=2,
                              max_depth=4)
    w, h = cam.image_width, cam.image_height
    n = w * h * 2
    ids = jnp.arange(n, dtype=jnp.uint32)
    px = (ids % w).astype(jnp.int32)
    py = ((ids // w) % h).astype(jnp.int32)

    base = scene.textures.color

    def loss(c0):
        tex = scene.textures._replace(color=base.at[:, 0].set(c0))
        sc = dataclasses.replace(scene, textures=tex)
        o, d, tm = generate_rays(cam, px, py, ids, 0)
        rad = wavefront.trace(sc, cam, o, d, tm, ids, 0,
                              differentiable=True)
        return (rad.x + rad.y + rad.z).mean()

    c0 = base[:, 0]
    g = jax.jit(jax.grad(loss))(c0)
    eps = 3e-3
    fd = []
    for i in range(c0.shape[0]):
        lp = jax.jit(loss)(c0.at[i].add(eps))
        lm = jax.jit(loss)(c0.at[i].add(-eps))
        fd.append((float(lp) - float(lm)) / (2 * eps))
    fd = np.asarray(fd)
    g = np.asarray(g)
    denom = np.maximum(np.abs(fd), 1e-3)
    relerr = float(np.max(np.abs(g - fd) / denom))
    print(f"fd gradcheck: max relerr={relerr:.4f} grad={g} fd={fd}",
          flush=True)
    return dict(max_relerr=round(relerr, 5), ok=bool(relerr < 0.05))


def grad_kernel_check():
    """On-chip gradient-tier cross-check (round 4): the PATHWISE
    gradient megakernel vs the XLA replay backward on cornell-glossy —
    loss and all parameter-gradient families must agree (the two
    implementations share no code beyond the scene tables)."""
    from go_raytracing_tpu.render.grad import render_grad
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    scene, cam = grt.load_scene("cornell-glossy")
    cam = dataclasses.replace(cam, image_width=128, aspect_ratio=1.0,
                              samples_per_pixel=8, max_depth=5)
    assert mega.grad_pathwise_applicable(scene, cam.max_depth)
    target = np.zeros((cam.image_height, cam.image_width, 3), np.float32)
    loss_k, gk = render_grad(scene, cam, target, spp=8, seed=0)
    os.environ["GRT_NO_GRADKERNEL"] = "1"
    try:
        loss_x, gx = render_grad(scene, cam, target, spp=8, seed=0)
    finally:
        del os.environ["GRT_NO_GRADKERNEL"]
    rel_loss = abs(float(loss_k) - float(loss_x)) / max(
        abs(float(loss_x)), 1e-12)
    worst = 0.0
    for k in gx:
        a, b = np.asarray(gk[k]), np.asarray(gx[k])
        den = max(float(np.abs(b).max()), 1e-12)
        worst = max(worst, float(np.abs(a - b).max()) / den)
    print(f"grad kernel check: rel_loss={rel_loss:.2e} worst_rel={worst:.2e}",
          flush=True)
    return dict(rel_loss=round(rel_loss, 9), worst_grad_rel=round(worst, 9),
                ok=bool(rel_loss < 1e-5 and worst < 1e-3))


def fd_specular_env_check():
    """On-chip FD evidence for the remaining parameter classes (VERDICT
    r4 #7): (a) one env TEXEL — the kernel-tier env gradient vs central
    FD of the pixel loss (a VALID oracle here: radiance is linear in
    texels, no visibility dependence, and both sides hold the
    alias/pdf tables fixed); (b) one fuzz and (c) one IOR — FD is NOT a
    gradient oracle for these (visibility-boundary jumps, DESIGN 7a),
    so the on-chip contract is per-family kernel-grad == replay-grad
    (the replay backward is jax.grad of the XLA path)."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega
    from go_raytracing_tpu.render.grad import render_grad

    out = {}
    # --- (a) env texel on hdri-test
    scene, cam = grt.load_scene("hdri-test")
    cam = dataclasses.replace(cam, image_width=96,
                              samples_per_pixel=4, max_depth=5)
    spp = 4
    target = np.zeros((cam.image_height, cam.image_width, 3), np.float32)
    _, gk = render_grad(scene, cam, target, spp=spp, seed=0)
    genv = np.asarray(gk["env_data"])
    y, x, c = np.unravel_index(int(np.abs(genv).argmax()), genv.shape)

    def env_loss(delta):
        env = scene.env._replace(
            data=scene.env.data.at[int(y), int(x), int(c)].add(delta))
        sc = dataclasses.replace(scene, env=env)
        fb = np.asarray(grt.render(sc, cam, spp=spp, seed=0),
                        dtype=np.float64)
        r = fb / spp - target
        return float((r * r).mean())

    eps = 0.05
    fd = (env_loss(eps) - env_loss(-eps)) / (2 * eps)
    rel = abs(float(genv[y, x, c]) - fd) / max(abs(fd), 1e-12)
    out["env_texel"] = dict(texel=[int(y), int(x), int(c)],
                            grad=float(genv[y, x, c]), fd=fd,
                            rel=round(rel, 6), ok=bool(rel < 0.02))
    print(f"fd env texel ({y},{x},{c}): grad={genv[y, x, c]:.3e} "
          f"fd={fd:.3e} rel={rel:.4f}", flush=True)

    # --- (b, c) fuzz / IOR: kernel-tier vs REPLAY-tier gradients,
    # per-family.  NOT FD: on the real chip the Mosaic kernel and the
    # XLA trace round differently (fma fusion), so a +-2e-3 IOR step
    # flips TIR/Schlick branches differently between the two forwards
    # and the FD deltas diverge (measured rel 0.6 while the ADJOINTS
    # agree to 1e-5).  The replay backward IS jax.grad of the XLA
    # path, so this pins the same contract, same-backend.
    scene, cam = grt.load_scene("cornell-glossy")
    cam = dataclasses.replace(cam, image_width=96, aspect_ratio=1.0,
                              samples_per_pixel=4, max_depth=5)
    assert mega.grad_pathwise_applicable(scene, cam.max_depth)
    target2 = np.zeros((cam.image_height, cam.image_width, 3), np.float32)
    _, gk2 = render_grad(scene, cam, target2, spp=4, seed=0)
    os.environ["GRT_NO_GRADKERNEL"] = "1"
    try:
        _, gx2 = render_grad(scene, cam, target2, spp=4, seed=0)
    finally:
        del os.environ["GRT_NO_GRADKERNEL"]
    for key in ("fuzz", "ior"):
        a, b2 = np.asarray(gk2[key]), np.asarray(gx2[key])
        den = max(float(np.abs(b2).max()), 1e-12)
        rel = float(np.abs(a - b2).max()) / den
        out[key] = dict(max_abs_xla=den, rel=round(rel, 8),
                        ok=bool(den > 1e-9 and rel < 1e-3))
        print(f"grad {key}: kernel-vs-replay max rel={rel:.2e} "
              f"(|xla|max {den:.3e})", flush=True)
    return out


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r02"
    assert jax.default_backend() == "tpu", "must run on the chip"
    result = dict(
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
        goldens=golden_compare(),
        fd_gradcheck=fd_gradcheck(),
        grad_kernel=grad_kernel_check(),
        fd_specular_env=fd_specular_env_check(),
    )
    result["all_ok"] = bool(
        all(v["ok"] for v in result["goldens"].values())
        and result["fd_gradcheck"]["ok"]
        and result["grad_kernel"]["ok"]
        and all(v["ok"] for v in result["fd_specular_env"].values())
    )
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"TPU_CHECK_{tag}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", path, "all_ok =", result["all_ok"], flush=True)


if __name__ == "__main__":
    main()
