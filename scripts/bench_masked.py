"""Masked big-scene bench (VERDICT r2 item 8): the procedural leaf
canopy (~12k alpha-masked tris, scene/procedural.make_leaf_scene — the
stand-in for the reference's sponza curtain) through the full PT frame,
masked vs mask-ignored, plus the golden-free self-check: masked shadow
rays must reach the ground where opaque cards would block them.

Writes results/bench_masked.csv.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.frontend.engine import traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators import pt as pt_mod
from imbatracer_tpu.scene.procedural import make_leaf_scene


def frame_time(scene, meta, cam, size, max_steps, has_masks, frames=6):
    def frame(i):
        return pt_mod.render_pt_frame(
            scene, cam, jnp.uint32(i), size, size, spp=1, max_len=6,
            has_masks=has_masks, with_stats=True, max_steps=max_steps)

    film, n = frame(0)
    jax.block_until_ready(film)
    t0 = time.time()
    total = 0
    for i in range(1, frames + 1):
        film, n = frame(i)
        total += int(n)
    jax.block_until_ready(film)
    dt = (time.time() - t0) / frames
    return dt * 1e3, total / frames, np.asarray(film)


def main():
    scene, meta = make_leaf_scene(num_leaves=6000)
    size = int(os.environ.get("SIZE", "1024"))
    settings = RenderSettings(width=size, height=size, spp=1, max_path_len=6)
    cam = camera_for_scene(meta, settings)
    max_steps = traversal_steps(meta)
    print(f"tris={meta.num_tris} mode={scene.bvh.mode} size={size} "
          f"backend={jax.default_backend()}")

    ms_m, rays_m, film_m = frame_time(scene, meta, cam, size, max_steps, True)
    ms_o, rays_o, film_o = frame_time(scene, meta, cam, size, max_steps, False)

    # Self-check: discs cover pi/4 of each card; treating cards as opaque
    # must block more light (darker ground) and trace no more rays than
    # the masked run re-traces.
    mean_m = float(film_m.mean())
    mean_o = float(film_o.mean())
    print(f"masked : {ms_m:8.1f} ms/frame  {rays_m/ms_m/1e3:6.2f} Mrays/s  "
          f"rays/frame {rays_m:.0f}  film mean {mean_m:.4f}")
    print(f"opaque : {ms_o:8.1f} ms/frame  {rays_o/ms_o/1e3:6.2f} Mrays/s  "
          f"rays/frame {rays_o:.0f}  film mean {mean_o:.4f}")
    ok = mean_m > mean_o * 1.05
    print("selfcheck (masked image brighter than opaque):",
          "PASS" if ok else "FAIL")

    os.makedirs("results", exist_ok=True)
    with open("results/bench_masked.csv", "w") as f:
        f.write("name,tris,mode,size,ms_per_frame,mrays,film_mean,selfcheck\n")
        f.write(f"leaf_canopy_masked,{meta.num_tris},{scene.bvh.mode},{size},"
                f"{ms_m:.1f},{rays_m/ms_m/1e3:.2f},{mean_m:.4f},"
                f"{'PASS' if ok else 'FAIL'}\n")
        f.write(f"leaf_canopy_opaque,{meta.num_tris},{scene.bvh.mode},{size},"
                f"{ms_o:.1f},{rays_o/ms_o/1e3:.2f},{mean_o:.4f},\n")
    print("wrote results/bench_masked.csv")


if __name__ == "__main__":
    main()
