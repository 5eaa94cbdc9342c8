"""A/B the two round-5 light-pass levers on TPU, one process:

  1. vmem dispatch octant pre-sort (traverse.py sort=True now sorts in
     vmem mode): closest coherent / closest scattered / any_hit
     scattered, slope method, sort=False (old behaviour) vs sort=True.
     Baseline (r5_qrow_split.txt): coherent 6.58 / scattered 22.24 /
     any 36.82 ms per 256k/512k dispatch.
  2. light-band one-flush vertex append (IMBA_APPEND_FLUSH): full vcm
     light band, flush vs in-loop append.  Baseline: append cost
     +134.9 ms/frame (light band lt ablation).

Usage: python scripts/r5_flush_sort_ab.py [cpu]
Appends to results/r5_flush_sort_ab.txt.
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time
import functools

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

from imbatracer_tpu.frontend.engine import estimate_pixel_size, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators import pt as pt_mod
from imbatracer_tpu.render.integrators import vcm as vcm_mod
from imbatracer_tpu.render.intersect import BIG
from imbatracer_tpu.render.light_cache import empty_cache
from imbatracer_tpu.render.traverse import any_hit, closest_hit
from imbatracer_tpu.scene.build import build_scene

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"
OUT = "/root/repo/results/r5_flush_sort_ab.txt"
SIZE = 128 if CPU else 1024
K = 4 if CPU else 32
REPS = 1 if CPU else 3
MAX_LEN = 10


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
    scene, meta = build_scene(SCENE, quiet=True)
    settings = RenderSettings(width=SIZE, height=SIZE, algorithm="vcm",
                              radius_factor=2.0)
    lpc = settings.resolved_light_path_count()
    if CPU:
        lpc = 1 << 12
    cam = camera_for_scene(meta, settings)
    px = estimate_pixel_size(scene, cam, meta)
    base_radius = jnp.float32(px * settings.radius_factor)
    pm_radius, mis_eta_vc, mis_eta_vm = vcm_mod._mis_constants(
        jnp.uint32(0), base_radius, lpc, "vcm")
    ms_steps = traversal_steps(meta)
    num_pixels = SIZE * SIZE
    num_r = min(vcm_mod.BAND_RAYS, num_pixels)
    log(f"# r5_flush_sort_ab size={SIZE} lpc={lpc} max_steps={ms_steps} "
        f"bvh_mode={scene.bvh.mode} K={K} reps={REPS} "
        f"backend={jax.default_backend()}")

    @jax.jit
    def floor_fn(x):
        def body(c, _):
            return c * 1.000001 + 0.5, None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return c

    t_floor, _ = timed(floor_fn, jnp.float32(1.0))
    log(f"floor (K={K} trivial):{t_floor:9.2f} ms/sync")

    # ------------------------------------------------------------------
    # 1. vmem sort A/B (sort static arg: False = old direct dispatch)
    # ------------------------------------------------------------------
    org0, d0, _, _ = pt_mod.camera_rays(cam, SIZE, SIZE, 1, jnp.uint32(0),
                                        start_pixel=0, count=num_r)
    tmin0 = jnp.zeros((num_r,), jnp.float32)
    hit0 = jax.block_until_ready(closest_hit(
        scene.bvh, org0, d0, tmin0, BIG, active=tmin0 < 1.0,
        max_steps=ms_steps, sort=False))
    hp = org0 + d0 * jnp.where(hit0.prim_id >= 0, hit0.t * 0.999,
                               1.0)[:, None]

    rng = np.random.default_rng(7)
    rd = rng.normal(size=(num_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)

    def slope_closest(org, d, label, sort):
        @jax.jit
        def run():
            def body(c, k):
                tm = jnp.zeros((num_r,), jnp.float32) \
                    + k.astype(jnp.float32) * 1e-7 + c * 0.0
                h = closest_hit(scene.bvh, org, d, tm, BIG,
                                active=tm < 1.0, max_steps=ms_steps,
                                sort=sort)
                return c + jnp.sum(1.0 / (1.0 + h.t * h.t)), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(K, dtype=jnp.int32))
            return c
        t, out = timed(run)
        net = (t - t_floor) / K
        log(f"closest {label:9s} sort={int(sort)} {num_r // 1024:4d}k:"
            f"{net:9.2f} ms/dispatch  (sum {float(out):.4f})")

    for sort in (False, True):
        slope_closest(org0, d0, "coherent", sort)
        slope_closest(hp, rd, "scattered", sort)

    org2 = jnp.concatenate([hp, hp])
    rd2 = jnp.concatenate([rd, -rd])
    tmax2 = jnp.full((2 * num_r,), 2.0, jnp.float32)

    def slope_any(sort):
        @jax.jit
        def run():
            def body(c, k):
                tm = k.astype(jnp.float32) * 1e-7 + jnp.zeros((2 * num_r,))
                occ = any_hit(scene.bvh, org2, rd2, tm, tmax2,
                              active=tm < 1.0, max_steps=ms_steps,
                              sort=sort)
                return c + jnp.sum(occ.astype(jnp.float32)) * 1e-6, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(K, dtype=jnp.int32))
            return c
        t, out = timed(run)
        log(f"any_hit scattered sort={int(sort)} {2 * num_r // 1024:4d}k:"
            f"{(t - t_floor) / K:9.2f} ms/dispatch  (sum {float(out):.4f})")

    for sort in (False, True):
        slope_any(sort)

    # ------------------------------------------------------------------
    # 2. light band: one-flush append vs in-loop (trace-time env read;
    #    _light_pass is called UNJITTED inside fresh jit wrappers so the
    #    env flip takes effect per trace)
    # ------------------------------------------------------------------
    lband = min(vcm_mod.BAND_RAYS, lpc)
    cache_capacity = vcm_mod.auto_cache_capacity(lpc, MAX_LEN)

    def light_band(frame):
        film, cache = vcm_mod._light_pass(
            scene, cam, frame, pm_radius, base_radius, mis_eta_vc,
            mis_eta_vm, algo="vcm", num_pixels=num_pixels,
            light_path_count=lpc, max_len=MAX_LEN,
            cache_capacity=cache_capacity, has_masks=False,
            has_bump=False, alpha_fn=None, max_steps=ms_steps,
            band_paths=lband)
        return film.sum(), cache.count

    for mode in ("1", "0"):
        os.environ["IMBA_APPEND_FLUSH"] = mode
        t, out = timed(jax.jit(light_band), jnp.uint32(0))
        nm = "flush " if mode == "1" else "inloop"
        log(f"light band {nm}      :{t:9.2f} ms  (count {int(out[1])}, "
            f"sum {float(out[0]):.3f})")


main()
