"""Quick VCM 512² A/B: traversal routing (pairs vs sorted-stream) on the
merge-kernel route, full frame + no-merge.  Run twice:
    IMBA_USE_PAIRS=1 python scripts/vcm_pairs_ab.py
    IMBA_USE_PAIRS=0 python scripts/vcm_pairs_ab.py
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.frontend.engine import estimate_pixel_size, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.vcm import TECHNIQUES, render_vcm_frame
from imbatracer_tpu.render.traverse import USE_PAIRS
from imbatracer_tpu.scene.build import build_scene

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"


def main():
    size = 512
    scene, meta = build_scene(SCENE, quiet=True)
    mat_kinds = tuple(sorted(set(
        int(k) for k in np.asarray(scene.materials.kind))))
    settings = RenderSettings(width=size, height=size, algorithm="vcm",
                              radius_factor=0.003)
    cam = camera_for_scene(meta, settings)
    px = estimate_pixel_size(scene, cam, meta)
    br = jnp.float32(px * settings.radius_factor)
    ms = traversal_steps(meta)
    print(f"USE_PAIRS={USE_PAIRS}", flush=True)

    for tag, techniques in (("no-merge",
                             tuple(t for t in TECHNIQUES if t != "merge")),
                            ("full", TECHNIQUES)):
        def frame(i):
            return render_vcm_frame(
                scene, cam, jnp.uint32(i), br, algo="vcm", width=size,
                height=size, max_len=10, techniques=techniques,
                max_steps=ms, merge_kernel=True, mat_kinds=mat_kinds)

        jax.block_until_ready(frame(0))
        t0 = time.time()
        for i in range(1, 3):
            jax.block_until_ready(frame(i))
        print(f"pairs={USE_PAIRS} {tag}: {(time.time()-t0)/2*1e3:.0f} "
              f"ms/frame", flush=True)


if __name__ == "__main__":
    main()
