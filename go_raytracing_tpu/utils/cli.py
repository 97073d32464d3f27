"""Command-line renderer (reference: main.go).

Usage:
    python -m go_raytracing_tpu.utils.cli -scene cornell [-spp 100]
        [-width 600] [-depth 5] [-out image.png] [-progressive]
        [-profile-dir profiles/] [-seed 0]

Mirrors the reference CLI's ``-scene`` registry and aliases
(main.go:108-152); profiling flags map Go pprof to jax.profiler traces.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU-native path tracer")
    ap.add_argument("-scene", default="hdri-test", help="scene name (main.go:26)")
    ap.add_argument("-spp", type=int, default=None)
    ap.add_argument("-width", type=int, default=None)
    ap.add_argument("-depth", type=int, default=None)
    ap.add_argument("-seed", type=int, default=0)
    ap.add_argument("-out", default="image.png")
    ap.add_argument("-progressive", action="store_true",
                    help="V-Ray-style preview/refine/final passes")
    ap.add_argument("-interactive", action="store_true",
                    help="serve a live-refining view over HTTP (headless "
                         "substitute for the reference's ebiten window, "
                         "main.go:90-95); final image is bit-identical")
    ap.add_argument("-interactive-port", type=int, default=8265)
    ap.add_argument("-profile-dir", default=None,
                    help="write jax.profiler traces here (cf. -profile)")
    ap.add_argument("-mem-stats", action="store_true",
                    help="print device/host memory report (cf. main.go -mem-stats)")
    ap.add_argument("-platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX backend (this environment pins the "
                         "TPU tunnel by default; cpu compiles locally)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update(
            "jax_platforms", "cpu" if args.platform == "cpu" else "axon,cpu"
        )

    import go_raytracing_tpu as grt
    from go_raytracing_tpu.utils.profiler import Profiler

    scene, cam = grt.load_scene(args.scene)
    if args.width:
        cam = dataclasses.replace(cam, image_width=args.width)
    if args.spp:
        cam = dataclasses.replace(cam, samples_per_pixel=args.spp)
    if args.depth:
        cam = dataclasses.replace(cam, max_depth=args.depth)

    print(
        f"Rendering '{args.scene}': {cam.image_width}x{cam.image_height} "
        f"@ {cam.samples_per_pixel} spp, depth {cam.max_depth}"
    )

    disp = None
    if args.interactive:
        from go_raytracing_tpu.render.display import LiveDisplay

        disp = LiveDisplay(port=args.interactive_port)
        print(f"Live view: {disp.url}")

    prof = Profiler(trace_dir=args.profile_dir)
    prof.start()
    t0 = time.perf_counter()
    try:
        if args.progressive:
            img = None
            for name, img in grt.render_progressive(scene, cam, seed=args.seed):
                print(f"  pass '{name}' done @ {time.perf_counter() - t0:.1f}s")
                if disp is not None:
                    disp.update(img, pass_name=name,
                                done_spp=cam.samples_per_pixel,
                                total_spp=cam.samples_per_pixel)
        elif disp is not None:
            # SPP-sliced refinement: the counter RNG makes the sliced
            # accumulation bit-identical to the one-shot render, so the
            # live view refines for free (same trick as checkpoint/resume).
            from go_raytracing_tpu.core import film as film_mod

            spp = cam.samples_per_pixel
            accum, done, n_rays = None, 0, cam.image_width * cam.image_height
            step = 1
            while done < spp:
                n = min(step, spp - done)
                accum = grt.render(scene, cam, spp=n, sample_offset=done,
                                   accum=accum, seed=args.seed)
                done += n
                step = min(step * 2, max(spp // 8, 1))
                el = time.perf_counter() - t0
                disp.update(
                    film_mod.tonemap(accum, done), pass_name="refining",
                    done_spp=done, total_spp=spp,
                    mrays=done * n_rays / el / 1e6,
                )
            img = film_mod.tonemap(accum, spp)
        else:
            img = grt.render_image(scene, cam, seed=args.seed)
    finally:
        prof.stop()
    wall = time.perf_counter() - t0
    if disp is not None:
        disp.update(img, pass_name="final", done_spp=cam.samples_per_pixel,
                    total_spp=cam.samples_per_pixel,
                    mrays=cam.image_width * cam.image_height
                    * cam.samples_per_pixel / wall / 1e6)

    prof.counters.add_launch(
        cam.image_width * cam.image_height, cam.samples_per_pixel,
        cam.max_depth, 1 if scene.n_lights else 0,
    )
    print(prof.report(wall))

    if args.mem_stats:
        from go_raytracing_tpu.utils.profiler import memory_report

        print(memory_report())

    grt.film.write_png(args.out, grt.film.to_uint8(img))
    print(f"Done in {wall:.2f}s. Image written to {args.out}")
    if disp is not None:
        if sys.stdin.isatty():
            try:
                input(f"Serving final frame at {disp.url} — Enter to exit. ")
            except EOFError:
                pass
        disp.close()


if __name__ == "__main__":
    main()
