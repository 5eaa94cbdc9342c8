"""Slope-method (true async) cost of the merge dispatch per (BLKQ, PT).

The r5_merge_split*/pt/blkq probes sync per call (block_until_ready),
which adds the ~22 ms tunnel round-trip floor to every row
(r5_prep_split's trivial "keys" stage measured 22.06 ms).  Deltas
between rows are fine; absolutes are not.  This wraps K=32
merge_contrib dispatches in ONE jit via lax.scan — each iteration
perturbs the query positions so XLA cannot CSE — and reports t(K)/K,
amortising the sync to ~0.7 ms.  An empty-scan control pins the floor.

Usage: python scripts/r5_merge_slope.py [cpu]
Appends to results/r5_merge_slope.txt.
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
OUT = "/root/repo/results/r5_merge_slope.txt"
SIZE = 128 if CPU else 1024
NUM_Q = (1 << 12) if CPU else vcm_mod.BAND_RAYS
K = 4 if CPU else 32
REPS = 1 if CPU else 3
COMBOS = ((256, 512), (128, 512), (128, 256), (64, 256))

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
        lpc = 1 << 10
    mat_kinds = tuple(sorted(set(
        int(k) for k in np.asarray(scene.materials.kind))))
    cam = camera_for_scene(meta, settings)
    px = estimate_pixel_size(scene, cam, meta)
    base_radius = jnp.float32(px * settings.radius_factor)
    cache_capacity = 2 * lpc
    pm_radius, mis_eta_vc, _ = vcm_mod._mis_constants(
        jnp.uint32(0), base_radius, lpc, "vcm")
    log(f"# r5_merge_slope size={SIZE} lpc={lpc} num_q={NUM_Q} K={K} "
        f"mat_kinds={mat_kinds} reps={REPS} backend={jax.default_backend()}")

    cache = empty_cache(cache_capacity)
    ms_steps = traversal_steps(meta)
    for start in range(0, lpc, vcm_mod.BAND_RAYS):
        bp = min(vcm_mod.BAND_RAYS, lpc - start)
        _, cache = vcm_mod._vcm_light_band(
            scene, cam, jnp.uint32(0), base_radius, jnp.int32(start), cache,
            algo="vcm", num_pixels=SIZE * SIZE, light_path_count=lpc,
            max_len=10, cache_capacity=cache_capacity,
            has_masks=False, has_bump=False, max_steps=ms_steps,
            techniques=vcm_mod.TECHNIQUES, band_paths=bp)
    cache = canonicalize(cache)
    n_photons = int(cache.count)
    valid = jnp.arange(cache_capacity) < cache.count
    log(f"photons {n_photons}/{cache_capacity}")

    rng = np.random.default_rng(0)
    idx = np.arange(NUM_Q) % max(n_photons, 1)
    qpos = jnp.asarray(
        (np.asarray(cache.pos)[idx]
         + rng.normal(scale=float(pm_radius) * 0.5, size=(NUM_Q, 3))
         ).astype(np.float32))
    nrm = rng.normal(size=(NUM_Q, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = jnp.asarray(nrm)
    wo = rng.normal(size=(NUM_Q, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    wo = jnp.asarray(wo)
    params = {
        "kind": jnp.zeros((NUM_Q,), jnp.int32),
        "kd": jnp.full((NUM_Q, 3), 0.5, jnp.float32),
        "ks": jnp.zeros((NUM_Q, 3), jnp.float32),
        "ns": jnp.ones((NUM_Q,), jnp.float32),
    }
    ones = jnp.ones((NUM_Q,), jnp.float32)
    active = jnp.ones((NUM_Q,), bool)
    eps = float(pm_radius) * 0.01

    # Floor control: K trivial chained steps, one sync.
    @jax.jit
    def floor_fn(x):
        def body(c, _):
            return c * 1.000001 + 0.5, None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return c

    t_floor, _ = timed(floor_fn, jnp.float32(1.0))
    log(f"floor (K={K} trivial): {t_floor:8.2f} ms total")

    for blkq, pt in COMBOS:
        pallas_merge.BLKQ = blkq
        pallas_merge.PT = pt
        pallas_merge.build_merge_grid.clear_cache()
        grid = jax.block_until_ready(pallas_merge.build_merge_grid(
            cache.pos, valid, pm_radius, cache.w_out, cache.throughput,
            cache.d_vcm, cache.d_vm))

        @jax.jit
        def slope(g):
            def body(carry, k):
                acc = carry
                qp = qpos + (k.astype(jnp.float32) * eps)[None]
                out = pallas_merge.merge_contrib(
                    g, qp, nrm, nrm, wo, params, ones, ones, active,
                    mis_eta_vc, kinds=mat_kinds, ppm=False)
                return acc + jnp.sum(out * out), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.int32))
            return acc

        try:
            t, _ = timed(slope, grid)
        except Exception as e:  # noqa: BLE001
            log(f"BLKQ={blkq:4d} PT={pt:4d}: FAIL {type(e).__name__}: "
                f"{str(e)[:120]}")
            continue
        log(f"BLKQ={blkq:4d} PT={pt:4d}: {t / K:8.2f} ms/dispatch "
            f"(K={K} total {t:8.1f} ms)")
    log("")


if __name__ == "__main__":
    main()
