"""Sponza smoke test: big textured+masked scene through the full pipeline."""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.scene.build import build_scene
from imbatracer_tpu.frontend.engine import make_frame_fn, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings


def main():
    t0 = time.time()
    scene, meta = build_scene("/root/reference/test/scenes/sponza/sponza.scene")
    print(f"build: {time.time()-t0:.1f}s  tris={meta.num_tris} mats={meta.num_materials} "
          f"lights={meta.num_lights} textures={meta.num_textures} masks={meta.has_masks} "
          f"bvh={meta.bvh_stats}")
    print("traversal steps:", traversal_steps(meta))

    size = 256
    settings = RenderSettings(width=size, height=size, max_path_len=4, algorithm="pt")
    frame_fn, cam = make_frame_fn(scene, meta, settings)
    t0 = time.time()
    film = frame_fn(jnp.uint32(0))
    jax.block_until_ready(film)
    print(f"first frame (compile+run): {time.time()-t0:.1f}s")
    t0 = time.time()
    for i in range(1, 4):
        film = film + frame_fn(jnp.uint32(i))
    jax.block_until_ready(film)
    print(f"3 more frames: {(time.time()-t0)/3:.2f}s each")
    img = np.asarray(film).reshape(size, size, 3) / 4
    print("mean", img.mean(), "max", img.max(), "finite", np.isfinite(img).all(),
          "nonzero frac", (img.sum(-1) > 0).mean())
    from imbatracer_tpu.io.image import store_png
    store_png("/tmp/sponza_smoke.png", img, weight=1.0, gamma=0.5)
    print("saved /tmp/sponza_smoke.png")


if __name__ == "__main__":
    main()
