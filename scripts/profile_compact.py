"""Measure the mid-frame compaction route (pt._render_pt_frame_compact)
against the plain banded megastep on cornell 1024^2, sweeping the
checkpoint depth.  Also prints the alive-lane fraction at each depth so
the phase-2 band count is visible."""

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
from imbatracer_tpu.scene.build import build_scene


def run(scene, meta, cam, size, max_steps, frames=8):
    def frame(i):
        return pt_mod.render_pt_frame(
            scene, cam, jnp.uint32(i), size, size, spp=1, max_len=10,
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
    scene, meta = build_scene(
        "/root/reference/test/scenes/cornell/cornell_org.scene")
    size = 1024
    settings = RenderSettings(width=size, height=size, spp=1, max_path_len=10)
    cam = camera_for_scene(meta, settings)
    max_steps = traversal_steps(meta)
    print("backend", jax.default_backend(), "mode", scene.bvh.mode)

    os.environ["IMBA_PT_COMPACT"] = "0"
    ms, mrays = run(scene, meta, cam, size, max_steps)
    print(f"banded (no compact): {ms:8.1f} ms/frame  {mrays:6.2f} Mrays/s")

    B = pt_mod.BAND_RAYS
    os.environ["IMBA_PT_COMPACT"] = "1"
    for d in (2, 3, 4, 5, 6):
        os.environ["IMBA_PT_COMPACT_DEPTH"] = str(d)
        alive = alive_after(scene, meta, cam, size, max_steps, d)
        k = -(-alive // B)
        os.environ.pop("IMBA_PT_COMPACT_K", None)
        ms, mrays = run(scene, meta, cam, size, max_steps)
        os.environ["IMBA_PT_COMPACT_K"] = str(k)
        ms2, mrays2 = run(scene, meta, cam, size, max_steps)
        print(f"compact d={d}: alive {alive/(size*size):5.1%} K={k}  "
              f"synced {ms:7.1f} ms {mrays:6.2f} Mr/s | "
              f"forced-K {ms2:7.1f} ms {mrays2:6.2f} Mr/s")
    os.environ.pop("IMBA_PT_COMPACT_K", None)


def alive_after(scene, meta, cam, size, max_steps, d):
    import jax.numpy as jnp
    tot = 0
    for start in range(0, size * size, pt_mod.BAND_RAYS):
        bp = min(pt_mod.BAND_RAYS, size * size - start)
        c, _ = pt_mod._pt_phase1(
            scene, cam, jnp.uint32(1), jnp.int32(start), width=size,
            height=size, spp=1, max_len=10, has_masks=meta.has_masks,
            has_bump=False, max_steps=max_steps, band_pixels=bp, bounces=d)
        tot += int(c["active"].sum())
    return tot


if __name__ == "__main__":
    main()
