"""PT megastep cost anatomy on cornell (the bench.py headline).

Measures, per path length: frame time, counted rays, marginal cost per
bounce and marginal rays per bounce — the gap between them is the
dead-lane waste a path-regeneration scheme would recover (wavefront
batches keep their static shape while Russian roulette + emitter hits
drain the active set; the reference's RayQueue::compact reclaims those
lanes, ray_queue.h:145-221).
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.scene.build import build_scene

SCENE = "/root/reference/test/scenes/cornell/cornell_org.scene"


def main():
    scene, meta = build_scene(SCENE, quiet=True)
    size = 1024
    settings = RenderSettings(width=size, height=size)
    cam = camera_for_scene(meta, settings)

    prev_t, prev_r = None, None
    for ml in (1, 2, 3, 4, 6, 8, 10):
        def frame(i):
            return render_pt_frame(scene, cam, jnp.uint32(i), size, size,
                                   max_len=ml, with_stats=True)

        film, n = frame(0)
        jax.block_until_ready(film)
        reps = 4
        t0 = time.time()
        rays = 0
        for i in range(1, reps + 1):
            film, n = frame(i)
            rays += int(n)
        jax.block_until_ready(film)
        dt = (time.time() - t0) / reps
        rays = rays // reps
        line = (f"max_len {ml:2d}: {dt*1e3:7.1f} ms/frame, "
                f"{rays/1e6:6.2f} Mrays -> {rays/dt/1e6:6.1f} Mrays/s")
        if prev_t is not None:
            dr = (rays - prev_r) / 1e6
            dtt = (dt - prev_t) * 1e3
            line += (f"   marginal: {dtt:+6.1f} ms for {dr:+5.2f} Mrays "
                     f"({dr*1e6/max(dtt,1e-9)/1e3:6.1f} Mrays/s marginal)")
        print(line, flush=True)
        prev_t, prev_r = dt, rays


if __name__ == "__main__":
    main()
