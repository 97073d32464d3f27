"""Generate SCALING.json: rays/s scaling over the device mesh.

CPU mode uses N virtual host devices (the same harness a pod run would
use, minus real ICI); TPU mode records the single-chip rate on this
box's one v5e.  BASELINE's >=80% 1->4-host target needs a real pod; this
artifact proves the harness end-to-end and records what this hardware
can measure.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_report.py --platform cpu
  python scripts/scaling_report.py --platform tpu   # single chip
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--width", type=int, default=200)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)

    import go_raytracing_tpu as grt
    from go_raytracing_tpu.parallel import multihost

    scene, cam = grt.load_scene(args.scene)
    cam = dataclasses.replace(
        cam, image_width=args.width, samples_per_pixel=args.spp, max_depth=5
    )
    n_dev = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= n_dev]

    def rounded(rs):
        return [{k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in r.items()} for r in rs]

    strong = multihost.scaling_report(scene, cam, spp=args.spp,
                                      device_counts=counts, mode="strong")
    weak = multihost.scaling_report(scene, cam, spp=args.spp,
                                    device_counts=counts, mode="weak")
    entry = dict(
        platform=jax.default_backend(),
        scene=args.scene,
        width=args.width,
        spp=args.spp,
        devices_available=n_dev,
        caveat=(
            "virtual host-platform devices SHARE this box's cores: "
            "per-'device' compute shrinks as N grows, so neither mode "
            "demonstrates nor refutes the >=80% 1->4-host TPU target "
            "here; they validate the sharded program end-to-end. The "
            "TPU-side argument is comm_analysis: measured single-chip "
            "rates vs the psum payload over published link bandwidths."
        ),
        strong_scaling=rounded(strong),
        weak_scaling=rounded(weak),
        comm_analysis=multihost.comm_analysis(scene, cam, n_devices=4),
    )

    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing[jax.default_backend()] = entry
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(entry, indent=2))


if __name__ == "__main__":
    main()
