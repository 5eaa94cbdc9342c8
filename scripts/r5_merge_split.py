"""Split the VCM merge cost: grid build vs query-prep machinery vs
photon walk.

chain22 (r4_vcmsplit.txt) pinned +1224 ms of the 3313 ms quality-row
frame on vertex merging — 37%, the dominant technique.  merge_contrib
(ops/pallas_merge.py) has three separable costs per camera-bounce
dispatch:

  build    — build_merge_grid: photon key sort + tile pack (once/frame)
  fixed    — XLA query prep: the (R, 40) qrec build, TWO full-width
             sorts (perm + inv_perm), permutation gathers, span
             searchsorted, plus the kernel's per-block DMA floor
  walk     — the kernel's photon-tile walk, ~ pairs ~ radius^2

The split: time merge_contrib against the REAL photon grid at the
production radius, then against a grid built at radius*1e-3 (spans
shrink to ~nothing; every fixed cost stays).  The delta is the walk.
Per-frame projection: 1024^2 = 4 bands x (max_len-1)=9 merge
dispatches = 36 x per-dispatch cost + 1 x build.

Usage: python scripts/r5_merge_split.py [cpu]   (cpu = tiny interpret
smoke run).  Appends to results/r5_merge_split.txt.
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

from imbatracer_tpu.frontend.engine import estimate_pixel_size, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators import vcm as vcm_mod
from imbatracer_tpu.render.light_cache import canonicalize, empty_cache
from imbatracer_tpu.scene.build import build_scene
from imbatracer_tpu.ops import pallas_merge

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"
OUT = "/root/repo/results/r5_merge_split.txt"
SIZE = 128 if CPU else 1024
NUM_Q = (1 << 12) if CPU else vcm_mod.BAND_RAYS  # queries per dispatch
REPS = 2 if CPU else 5

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
    max_len = 10
    cache_capacity = 2 * lpc
    pm_radius, mis_eta_vc, _ = vcm_mod._mis_constants(
        jnp.uint32(0), base_radius, lpc, "vcm")
    log(f"# r5_merge_split size={SIZE} lpc={lpc} radius_factor=2.0 "
        f"pm_radius={float(pm_radius):.6f} num_q={NUM_Q} "
        f"mat_kinds={mat_kinds} reps={REPS} backend={jax.default_backend()}")

    # --- real light pass -> photon cache (one band at lpc <= 2^18) ----
    cache = empty_cache(cache_capacity)
    ms_steps = traversal_steps(meta)
    for start in range(0, lpc, vcm_mod.BAND_RAYS):
        bp = min(vcm_mod.BAND_RAYS, lpc - start)
        _, cache = vcm_mod._vcm_light_band(
            scene, cam, jnp.uint32(0), base_radius, jnp.int32(start), cache,
            algo="vcm", num_pixels=SIZE * SIZE, light_path_count=lpc,
            max_len=max_len, cache_capacity=cache_capacity,
            has_masks=False, has_bump=False, max_steps=ms_steps,
            techniques=vcm_mod.TECHNIQUES, band_paths=bp)
    cache = canonicalize(cache)
    n_photons = int(cache.count)
    log(f"light pass: {n_photons} photons cached "
        f"(capacity {cache_capacity})")

    # --- 1. grid build (once per frame) -------------------------------
    valid = jnp.arange(cache_capacity) < cache.count

    def build(radius):
        return pallas_merge.build_merge_grid(
            cache.pos, valid, radius, cache.w_out, cache.throughput,
            cache.d_vcm, cache.d_vm)

    t_build, grid = timed(jax.jit(build), pm_radius)
    log(f"grid build          : {t_build:8.2f} ms  "
        f"({grid.tiles.shape[0]} photon tiles)")
    _, grid_tiny = timed(jax.jit(build), pm_radius * 1e-3)

    # --- 2. merge_contrib: fixed machinery vs photon walk -------------
    # Realistic queries: photon positions cycled over NUM_Q lanes with a
    # half-radius jitter (span distribution matches real camera hits on
    # the same surfaces), random shading frames, diffuse params.
    rng = np.random.default_rng(0)
    idx = np.arange(NUM_Q) % max(n_photons, 1)
    qpos = (np.asarray(cache.pos)[idx]
            + rng.normal(scale=float(pm_radius) * 0.5, size=(NUM_Q, 3))
            ).astype(np.float32)
    nrm = rng.normal(size=(NUM_Q, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    wo = rng.normal(size=(NUM_Q, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    params = {
        "kind": jnp.zeros((NUM_Q,), jnp.int32),
        "kd": jnp.full((NUM_Q, 3), 0.5, jnp.float32),
        "ks": jnp.zeros((NUM_Q, 3), jnp.float32),
        "ns": jnp.ones((NUM_Q,), jnp.float32),
    }
    ones = jnp.ones((NUM_Q,), jnp.float32)
    active = jnp.ones((NUM_Q,), bool)
    qpos, nrm, wo = jnp.asarray(qpos), jnp.asarray(nrm), jnp.asarray(wo)

    @jax.jit
    def contrib(g):
        out = pallas_merge.merge_contrib(
            g, qpos, nrm, nrm, wo, params, ones, ones, active,
            mis_eta_vc, kinds=mat_kinds, ppm=False)
        # consume nonlinearly so XLA cannot fold the reduction
        return jnp.sum(out * out)

    t_real, _ = timed(contrib, grid)
    t_tiny, _ = timed(contrib, grid_tiny)
    log(f"merge dispatch real : {t_real:8.2f} ms / {NUM_Q} queries")
    log(f"merge dispatch tiny : {t_tiny:8.2f} ms  (radius*1e-3: fixed "
        f"qrec+sorts+DMA floor)")
    log(f"  -> photon walk    : {t_real - t_tiny:8.2f} ms "
        f"({100.0 * (t_real - t_tiny) / max(t_real, 1e-9):.0f}% of "
        f"dispatch)")
    bands = -(-SIZE * SIZE // vcm_mod.BAND_RAYS)
    n_disp = bands * (max_len - 1)
    log(f"frame projection    : build {t_build:.1f} + {n_disp} x "
        f"{t_real:.1f} = {t_build + n_disp * t_real:8.1f} ms vs "
        f"chain22 merge delta +1224 ms")
    log("")


if __name__ == "__main__":
    main()
