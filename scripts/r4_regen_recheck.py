"""Round-4 item 7: re-measure the regenerated-wavefront PT after the
log-based deferred film flush (commit 78a3d58) — round 3 shipped the
rework without re-timing it.  If it still loses to the banded megastep,
the route gets folded (kept as a test-only estimator check).

Writes to results/r4_regen.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.pt import (render_pt_frame,
                                                  render_pt_frame_regen)
from imbatracer_tpu.scene.build import build_scene

OUT = "/root/repo/results/r4_regen.txt"


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    scene, meta = build_scene(
        "/root/reference/test/scenes/cornell/cornell_org.scene", quiet=True)
    size = 1024
    settings = RenderSettings(width=size, height=size)
    cam = camera_for_scene(settings=settings, meta=meta)
    log(f"# regen recheck  backend={jax.default_backend()} mode={scene.bvh.mode}")

    for name, render in (("banded", render_pt_frame),
                         ("regen", render_pt_frame_regen)):
        def fr(i):
            return render(scene, cam, jnp.uint32(i), size, size,
                          with_stats=True)
        film, n = fr(0)
        jax.block_until_ready(film)
        reps = 10
        t0 = time.time()
        rays = 0
        for i in range(1, reps + 1):
            film, n = fr(i)
            rays += int(n)
        jax.block_until_ready(film)
        dt = (time.time() - t0) / reps
        log(f"{name:7s}: {dt*1e3:7.1f} ms/frame  "
            f"{rays/reps/dt/1e6:6.1f} Mrays/s")


if __name__ == "__main__":
    main()
