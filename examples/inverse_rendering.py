"""Inverse rendering demo: recover material parameters from a target image.

Renders a target scene, perturbs the albedo/emission/fuzz tables, then
runs SGD through the differentiable renderer (rays sharded over whatever
devices are available) until the parameters recover.  This is the
BASELINE north-star flow: reverse-mode gradients w.r.t. material albedo,
fuzz, IOR, texture maps, and light emission, all-reduced across the mesh
inside the backward pass.

Run:  python examples/inverse_rendering.py [--steps 60] [--platform cpu]
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--mesh", action="store_true",
                    help="shard every gradient chunk over the device "
                         "mesh (render_grad's shard_map mode)")
    ap.add_argument("--train-step", action="store_true",
                    help="legacy one-program sharding.train_step SGD "
                         "instead of the production chunked pipeline")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    import go_raytracing_tpu as grt
    from go_raytracing_tpu.camera import Camera
    from go_raytracing_tpu.parallel import sharding

    def build():
        b = grt.SceneBuilder()
        floor = b.lambertian((0.7, 0.5, 0.3))
        b.quad((-6, 0, -6), (12, 0, 0), (0, 0, 12), floor)
        b.sphere((0, 1, 0), 1.0, b.lambertian((0.2, 0.4, 0.8)))
        b.sphere((2.2, 0.7, 1), 0.7, b.metal((0.9, 0.8, 0.6), 0.15))
        light = b.diffuse_light((8, 8, 8))
        q = b.quad((-1.5, 5, -1.5), (3, 0, 0), (0, 0, 3), light)
        b.add_light(q)
        return b.build()

    cam = Camera(
        image_width=48, aspect_ratio=1.0, samples_per_pixel=args.spp,
        max_depth=4, look_from=(0, 3, 7), look_at=(0, 0.5, 0),
        background=(0, 0, 0), vfov=45.0,
    )

    scene = build()
    mesh = sharding.make_mesh()
    print(f"devices: {mesh.devices.size} ({jax.default_backend()})")

    target = sharding.render_sharded(
        scene, cam, mesh, jnp.uint32(0), spp=args.spp
    ) / args.spp
    print(f"target rendered: mean {float(target.mean()):.4f}")

    # Projection onto the physically valid set (the reference's
    # materials assume albedo in [0,1]; unconstrained SGD at this lr
    # lets albedo drift past 1, multi-bounce energy self-amplifies and
    # the loss NaNs within ~10 steps — measured).  Emission rows (the
    # light's texture) stay merely non-negative.
    kinds = np.asarray(scene.materials.kind)
    tex_ids = np.asarray(scene.materials.tex)
    is_em = np.zeros(scene.textures.color.shape[0], bool)
    is_em[tex_ids[kinds == 3]] = True
    em_mask = jnp.asarray(is_em)[:, None]

    def project(p):
        p = dict(p)
        p["color"] = jnp.where(em_mask, jnp.maximum(p["color"], 0.0),
                               jnp.clip(p["color"], 0.0, 1.0))
        p["even_color"] = jnp.clip(p["even_color"], 0.0, 1.0)
        p["odd_color"] = jnp.clip(p["odd_color"], 0.0, 1.0)
        p["fuzz"] = jnp.clip(p["fuzz"], 0.0, 1.0)
        p["ior"] = jnp.clip(p["ior"], 1.0, 2.5)
        return p

    # Perturb: gray albedos, dimmer light, wrong fuzz
    p0 = sharding.trainable_params(scene)
    rng = np.random.default_rng(0)
    perturbed = dict(p0)
    perturbed["color"] = jnp.asarray(
        np.clip(np.asarray(p0["color"]) * rng.uniform(0.4, 1.6, p0["color"].shape), 0.05, 15.0),
        jnp.float32,
    )
    perturbed["fuzz"] = jnp.clip(p0["fuzz"] + 0.2, 0.0, 1.0)
    scene_hat = sharding.apply_params(scene, project(perturbed))

    from go_raytracing_tpu.render.grad import render_grad

    # Adam over the PRODUCTION chunked pipeline (render/grad.py) — the
    # parameter families span 3 orders of magnitude (albedo ~0.5,
    # emission ~8), so plain SGD either crawls or overshoots; Adam's
    # per-parameter scaling converges at one lr.  Projection keeps the
    # iterates physical.
    tm_ = jax.tree_util.tree_map
    adam_m = tm_(jnp.zeros_like, p0)
    adam_v = tm_(jnp.zeros_like, p0)
    b1, b2, eps = 0.9, 0.999, 1e-8
    for step in range(args.steps):
        if args.train_step:
            scene_hat, loss = sharding.train_step(
                scene_hat, cam, mesh, target, jnp.uint32(step + 1),
                jnp.float32(args.lr), spp=args.spp,
            )
            scene_hat = sharding.apply_params(
                scene_hat, project(sharding.trainable_params(scene_hat)))
        else:
            loss, grads = render_grad(
                scene_hat, cam, np.asarray(target), spp=args.spp,
                seed=step + 1, mesh=mesh if args.mesh else None,
            )
            params = sharding.trainable_params(scene_hat)
            adam_m = tm_(lambda m_, g: b1 * m_ + (1 - b1) * g,
                         adam_m, grads)
            adam_v = tm_(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                         adam_v, grads)
            t = step + 1

            def upd(p_, m_, v_):
                mh = m_ / (1 - b1 ** t)
                vh = v_ / (1 - b2 ** t)
                return p_ - args.lr * mh / (jnp.sqrt(vh) + eps)

            params = tm_(upd, params, adam_m, adam_v)
            scene_hat = sharding.apply_params(scene_hat, project(params))
        if step % 10 == 0 or step == args.steps - 1:
            err = jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).mean()),
                sharding.trainable_params(scene_hat), p0,
            )
            print(
                f"step {step:3d}  loss {float(loss):.6f}  "
                f"albedo err {err['color']:.4f}  fuzz err {err['fuzz']:.4f}"
            )

    final = sharding.trainable_params(scene_hat)
    print("\nrecovered vs true albedo rows:")
    print(np.asarray(final["color"]))
    print(np.asarray(p0["color"]))


if __name__ == "__main__":
    main()
