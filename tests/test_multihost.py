"""Multi-host (multi-process) execution path.

The reference is single-process (SURVEY.md §2.9); our distributed backend
is ``jax.distributed`` + a global device mesh (parallel/multihost.py).
Real pods aren't available in CI, so this launches TWO local CPU
processes (2 virtual devices each -> a 4-device global mesh, gloo
collectives) and asserts the distributed render is identical across
processes and matches the single-process renderer.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
out_dir = sys.argv[4]
from go_raytracing_tpu.parallel import multihost
multihost.initialize(coordinator_address='127.0.0.1:' + port,
                     num_processes=n, process_id=pid)
assert len(jax.devices()) == 2 * n, jax.devices()
import numpy as np
import dataclasses
import go_raytracing_tpu as grt
from go_raytracing_tpu.parallel import sharding
scene, cam = grt.load_scene('simple')
cam = dataclasses.replace(cam, image_width=32, samples_per_pixel=2,
                          max_depth=3)
mesh = sharding.make_mesh()
fb = sharding.render_sharded(scene, cam, mesh, np.uint32(0), spp=2)
np.save(os.path.join(out_dir, 'mh_fb_%d.npy' % pid), np.asarray(fb))
"""


@pytest.mark.slow
def test_two_process_distributed_render_matches(tmp_path):
    """multihost.initialize + render_sharded over a 2-process global mesh
    produce the same framebuffer on every process, equal to the
    single-process render (counter-based RNG is layout-invariant)."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=REPO))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    port = "18713"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        logs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    fb0 = np.load(tmp_path / "mh_fb_0.npy")
    fb1 = np.load(tmp_path / "mh_fb_1.npy")
    np.testing.assert_array_equal(fb0, fb1)

    # Single-process reference (this pytest process, 8 virtual devices)
    import dataclasses
    import go_raytracing_tpu as grt

    scene, cam = grt.load_scene("simple")
    cam = dataclasses.replace(cam, image_width=32, samples_per_pixel=2,
                              max_depth=3)
    ref = np.asarray(grt.render(scene, cam, spp=2, seed=0))
    np.testing.assert_allclose(fb0, ref, rtol=2e-5, atol=2e-5)


def test_scaling_report_runs():
    """multihost.scaling_report executes on the virtual CPU mesh and
    reports sane efficiencies (shape check, not a perf assertion — CPU
    virtual devices share cores)."""
    import dataclasses
    import go_raytracing_tpu as grt
    from go_raytracing_tpu.parallel import multihost

    scene, cam = grt.load_scene("simple")
    cam = dataclasses.replace(cam, image_width=32, samples_per_pixel=2,
                              max_depth=3)
    results = multihost.scaling_report(scene, cam, spp=2,
                                       device_counts=[1, 2])
    assert [r["devices"] for r in results] == [1, 2]
    for r in results:
        assert r["rays_per_s"] > 0
        assert 0 < r["efficiency"] <= 2.0
