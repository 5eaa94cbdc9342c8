"""Split the VCM quality-row 'light_hit only' floor (1126 ms, chain22).

Components timed separately at the quality-row config (cornell_specular
1024², lpc 131072, vmem traversal):

  light band   — _vcm_light_band (1 band of 131072 paths x 10 bounces,
                 trace + shade + cache scatter)
  canonicalize — the (path, bounce) cache re-sort
  grid build   — build_merge_grid (keys sort + tile pack)
  camera band  — _vcm_camera_band with techniques=('light_hit',) per
                 2^18-pixel band (x4 per frame)
  camera full  — same band with ALL techniques (the in-fusion cost of
                 NEE+connect+merge, cross-checks chain22's +2187)

Usage: python scripts/r5_floor_split.py [cpu]
Appends to results/r5_floor_split.txt.
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

CPU = len(sys.argv) > 1 and sys.argv[1] == "cpu"
if CPU:
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np
import functools

from imbatracer_tpu.frontend.engine import estimate_pixel_size, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators import vcm as vcm_mod
from imbatracer_tpu.render.light_cache import canonicalize, empty_cache
from imbatracer_tpu.scene.build import build_scene
from imbatracer_tpu.ops import pallas_merge

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"
OUT = "/root/repo/results/r5_floor_split.txt"
SIZE = 128 if CPU else 1024
REPS = 2 if CPU else 5
MAX_LEN = 10

if CPU:
    pallas_merge.INTERPRET = True


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def timed(fn, *args, reps=REPS):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps * 1e3, out


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    scene, meta = build_scene(SCENE, quiet=True)
    settings = RenderSettings(width=SIZE, height=SIZE, algorithm="vcm",
                              radius_factor=2.0)
    lpc = settings.resolved_light_path_count()
    if CPU:
        lpc = 1 << 12
    mat_kinds = tuple(sorted(set(
        int(k) for k in np.asarray(scene.materials.kind))))
    cam = camera_for_scene(meta, settings)
    px = estimate_pixel_size(scene, cam, meta)
    base_radius = jnp.float32(px * settings.radius_factor)
    cache_capacity = 2 * lpc
    ms_steps = traversal_steps(meta)
    num_pixels = SIZE * SIZE
    band = min(vcm_mod.BAND_RAYS, num_pixels)
    num_bands = -(-num_pixels // band)
    log(f"# r5_floor_split size={SIZE} lpc={lpc} mat_kinds={mat_kinds} "
        f"max_steps={ms_steps} reps={REPS} bands={num_bands} "
        f"backend={jax.default_backend()}")

    # --- light band -------------------------------------------------------
    cache0 = empty_cache(cache_capacity)
    lband = min(vcm_mod.BAND_RAYS, lpc)

    @jax.jit
    def light_band(frame, cache):
        film, cache = vcm_mod._vcm_light_band(
            scene, cam, frame, base_radius, jnp.int32(0), cache,
            algo="vcm", num_pixels=num_pixels, light_path_count=lpc,
            max_len=MAX_LEN, cache_capacity=cache_capacity,
            has_masks=False, has_bump=False, max_steps=ms_steps,
            techniques=vcm_mod.TECHNIQUES, band_paths=lband)
        return film, cache

    t_light, (_, cache) = timed(light_band, jnp.uint32(0), cache0)
    n_lbands = -(-lpc // lband)
    log(f"light band          : {t_light:8.2f} ms x {n_lbands}/frame")

    # --- canonicalize -----------------------------------------------------
    t_canon, cache = timed(jax.jit(canonicalize), cache)
    log(f"canonicalize        : {t_canon:8.2f} ms")

    # --- grid build -------------------------------------------------------
    pm_radius, _, _ = vcm_mod._mis_constants(
        jnp.uint32(0), base_radius, lpc, "vcm")
    valid = jnp.arange(cache_capacity) < cache.count

    @jax.jit
    def build():
        return pallas_merge.build_merge_grid(
            cache.pos, valid, pm_radius, cache.w_out, cache.throughput,
            cache.d_vcm, cache.d_vm)

    t_build, grid = timed(build)
    log(f"grid build          : {t_build:8.2f} ms")

    # --- camera band: light_hit only vs full techniques -------------------
    def cam_band(techniques, frame):
        return vcm_mod._vcm_camera_band(
            scene, cam, frame, cache, grid, base_radius, algo="vcm",
            width=SIZE, height=SIZE, spp=1, max_len=MAX_LEN,
            light_path_count=lpc, num_connections=1, num_knn=10,
            table_size=2 * cache_capacity, max_per_cell=4,
            has_masks=False, has_bump=False, max_steps=ms_steps,
            techniques=techniques, start_pixel=jnp.int32(0),
            band_pixels=band, mat_kinds=mat_kinds)

    for label, tech in (("light_hit", ("light_hit",)),
                        ("full", vcm_mod.TECHNIQUES)):
        t_cam, _ = timed(
            jax.jit(functools.partial(cam_band, tech)), jnp.uint32(0))
        log(f"camera band {label:9s}: {t_cam:8.2f} ms x {num_bands}/frame")

    log("")


if __name__ == "__main__":
    main()
