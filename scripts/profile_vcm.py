"""Per-technique VCM frame-cost breakdown on TPU.

Renders cornell_specular with technique subsets (the MIS-debug gating in
render/integrators/vcm.py) and diffs wall times: the cost of `connect`,
`merge`, `next_event`, `cam_connect` and the raw passes falls out without
any in-kernel instrumentation.  Drives VERDICT round-2 item 3 (make VCM
frames cheap enough to converge)."""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.frontend.engine import estimate_pixel_size, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.vcm import TECHNIQUES, render_vcm_frame
from imbatracer_tpu.scene.build import build_scene

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"


def time_frame(scene, cam, base_radius, size, techniques, max_steps, reps=3):
    def frame(i):
        return render_vcm_frame(
            scene, cam, jnp.uint32(i), base_radius, algo="vcm",
            width=size, height=size, max_len=10,
            techniques=tuple(techniques), max_steps=max_steps,
        )

    jax.block_until_ready(frame(0))          # compile
    t0 = time.time()
    for i in range(1, reps + 1):
        jax.block_until_ready(frame(i))
    return (time.time() - t0) / reps


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene, meta = build_scene(SCENE, quiet=True)
    settings = RenderSettings(width=size, height=size, algorithm="vcm",
                              radius_factor=0.003)
    cam = camera_for_scene(meta, settings)
    px = estimate_pixel_size(scene, cam, meta)
    br = jnp.float32(px * settings.radius_factor)
    ms = traversal_steps(meta)

    full = time_frame(scene, cam, br, size, TECHNIQUES, ms)
    print(f"full frame          : {full * 1e3:8.1f} ms", flush=True)
    for drop in TECHNIQUES:
        sub = tuple(t for t in TECHNIQUES if t != drop)
        t = time_frame(scene, cam, br, size, sub, ms)
        print(f"without {drop:12s}: {t * 1e3:8.1f} ms  "
              f"(delta {1e3 * (full - t):+7.1f} ms)", flush=True)
    # Passes alone: light pass only / camera pass only.
    t = time_frame(scene, cam, br, size, ("light_hit",), ms)
    print(f"camera light_hit only: {t * 1e3:7.1f} ms", flush=True)
