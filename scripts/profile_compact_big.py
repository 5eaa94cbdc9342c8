"""PT mid-frame compaction A/B on the OPEN big procedural scene.

Cornell (closed box) showed compaction losing for PT: lanes only die by
Russian roulette, so there is little dead-lane work to skip and the
extra dispatches + sort dominate.  The big scene is open — most bounce
rays escape to the environment — so the alive fraction collapses after
a couple of bounces and phase 2 should shrink to a fraction of the
bands.  This measures where PT compaction's break-even actually is
(reference role: RayQueue::compact_rays, ray_queue.h:188-207).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from imbatracer_tpu.frontend.engine import traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators import pt as pt_mod
from imbatracer_tpu.scene.procedural import make_big_scene

MAX_LEN = 6  # bench_big config


def run(scene, meta, cam, size, max_steps, frames=4):
    def frame(i):
        return pt_mod.render_pt_frame(
            scene, cam, jnp.uint32(i), size, size, spp=1, max_len=MAX_LEN,
            has_masks=meta.has_masks, with_stats=True, max_steps=max_steps)

    film, n = frame(0)
    jax.block_until_ready(film)
    t0 = time.time()
    total = 0
    for i in range(1, frames + 1):
        film, n = frame(i)
        total += int(n)
    jax.block_until_ready(film)
    dt = time.time() - t0
    return dt / frames * 1e3, total / dt / 1e6


def main():
    scene, meta = make_big_scene(4000)
    size = 1024
    settings = RenderSettings(width=size, height=size, spp=1,
                              max_path_len=MAX_LEN)
    cam = camera_for_scene(meta, settings)
    max_steps = traversal_steps(meta)
    print(f"backend {jax.default_backend()} mode {scene.bvh.mode} "
          f"tris {meta.num_tris}")

    os.environ["IMBA_PT_COMPACT"] = "0"
    ms, mrays = run(scene, meta, cam, size, max_steps)
    print(f"banded (no compact): {ms:8.1f} ms/frame  {mrays:6.2f} Mrays/s",
          flush=True)

    B = pt_mod.BAND_RAYS
    os.environ["IMBA_PT_COMPACT"] = "1"
    for d in (1, 2, 3):
        os.environ["IMBA_PT_COMPACT_DEPTH"] = str(d)
        alive = 0
        for start in range(0, size * size, B):
            bp = min(B, size * size - start)
            c, _ = pt_mod._pt_phase1(
                scene, cam, jnp.uint32(1), jnp.int32(start), width=size,
                height=size, spp=1, max_len=MAX_LEN,
                has_masks=meta.has_masks, has_bump=False,
                max_steps=max_steps, band_pixels=bp, bounces=d)
            alive += int(c["active"].sum())
        ms, mrays = run(scene, meta, cam, size, max_steps)
        print(f"compact d={d}: alive {alive / (size * size):5.1%}  "
              f"{ms:8.1f} ms/frame  {mrays:6.2f} Mrays/s", flush=True)
    os.environ.pop("IMBA_PT_COMPACT", None)


if __name__ == "__main__":
    main()
