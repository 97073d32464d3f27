"""Benchmark harness: headline metric is Mrays/s/chip on the Cornell Box
(600x338-equivalent workload per BASELINE.md).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Rays counted like the reference profiler would (segments actually traced:
pixels * spp * bounces-with-live-rays is unknowable cheaply, so we report
*camera rays* per second — pixels * spp / wall — the same normalization the
reference's rays/s report uses for its Mrays metric, rt/profiler.go:286-313;
each camera ray implies up to max_depth wavefront segments + shadow rays).

vs_baseline: the reference renders Cornell 600x600x100spp in 60-120 s on a
multicore CPU (devlog, BASELINE.md) => ~0.3-0.6 Mrays/s camera-ray rate;
we normalize against the midpoint 0.4 Mrays/s.
"""

import dataclasses
import json
import sys
import time


def main():
    import jax
    import go_raytracing_tpu as grt
    from go_raytracing_tpu.scenes.builders import cornell_box_scene

    scene, cam = cornell_box_scene()
    # BASELINE benchmark shape: 600x338 @ 100 SPP, depth 5 (scene default).
    cam = dataclasses.replace(
        cam, aspect_ratio=600.0 / 338.0, image_width=600, samples_per_pixel=100
    )
    spp = cam.samples_per_pixel
    from go_raytracing_tpu.render.renderer import pick_chunk_size

    chunk = min(
        pick_chunk_size(scene),
        cam.image_width * cam.image_height * spp,
    )
    chunk = max(1024, (chunk // 1024) * 1024)

    # Warmup / compile: one chunk of the *same* jitted program (same static
    # spp/chunk/max_depth), so the timed run hits the executable cache.
    grt.render(scene, cam, spp=spp, seed=0, chunk=chunk,
               sample_offset=0, accum=None)  # first call compiles
    stats = grt.RenderStats()
    t0 = time.perf_counter()
    accum = grt.render(scene, cam, spp=spp, seed=0, chunk=chunk, stats=stats)
    wall = time.perf_counter() - t0

    n_rays = cam.image_width * cam.image_height * spp
    mrays = n_rays / wall / 1e6
    baseline_mrays = 0.4  # reference CPU camera-ray rate (BASELINE.md)

    img = grt.film.tonemap(accum, spp)
    grt.film.write_png("image.png", grt.film.to_uint8(img))

    print(json.dumps({
        "metric": "cornell_camera_mrays_per_s_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 2),
    }))


if __name__ == "__main__":
    main()
