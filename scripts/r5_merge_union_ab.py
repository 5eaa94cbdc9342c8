"""Slope-method A/B of the merge union walk (IMBA_MERGE_UNION).

The 4 combo tile spans overlap ~49% at production scale (dedup-steps,
results/r5_qrow_split.txt); the union kernel visits each tile once and
pair-tests all four combo keys (8 f32 compares vs 2).  Expected: pair
slots halve, kernel time follows (chain33: the walk is compute bound).

Usage: python scripts/r5_merge_union_ab.py [cpu]
Appends to results/r5_merge_union_ab.txt.
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

from imbatracer_tpu.frontend.engine import estimate_pixel_size
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators import vcm as vcm_mod
from imbatracer_tpu.render.light_cache import canonicalize, empty_cache
from imbatracer_tpu.scene.build import build_scene
from imbatracer_tpu.ops import pallas_merge

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"
OUT = "/root/repo/results/r5_merge_union_ab.txt"
SIZE = 128 if CPU else 1024
K = 4 if CPU else 32
REPS = 1 if CPU else 3
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
    pm_radius, mis_eta_vc, _ = vcm_mod._mis_constants(
        jnp.uint32(0), base_radius, lpc, "vcm")
    num_q = SIZE * SIZE // 4

    cap = vcm_mod.auto_cache_capacity(lpc, MAX_LEN)
    cache = vcm_mod.debug_light_cache(scene, cam, jnp.uint32(0),
                                      base_radius, lpc, MAX_LEN) \
        if hasattr(vcm_mod, "debug_light_cache") else None
    if cache is None:
        from imbatracer_tpu.frontend.engine import traversal_steps
        _, cache = vcm_mod._vcm_light_band(
            scene, cam, jnp.uint32(0), base_radius, jnp.int32(0),
            empty_cache(cap), algo="vcm", num_pixels=SIZE * SIZE,
            light_path_count=lpc, max_len=MAX_LEN, cache_capacity=cap,
            has_masks=False, has_bump=False,
            max_steps=traversal_steps(meta),
            techniques=vcm_mod.TECHNIQUES, band_paths=min(lpc, 1 << 16))
    cache = canonicalize(cache)
    valid = jnp.arange(cache.capacity) < cache.count
    log(f"# r5_merge_union_ab size={SIZE} lpc={lpc} num_q={num_q} K={K} "
        f"mat_kinds={mat_kinds} photons={int(cache.count)} "
        f"BLKQ={pallas_merge.BLKQ} PT={pallas_merge.PT} "
        f"backend={jax.default_backend()}")

    rng = np.random.default_rng(11)
    sel = rng.integers(0, max(int(cache.count), 1), num_q)
    qpos = jnp.asarray(np.asarray(cache.pos)[sel])
    nrm = jnp.asarray(np.asarray(cache.normal)[sel])
    wo = rng.normal(size=(num_q, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    wo = jnp.asarray(wo)
    params = {
        "kind": jnp.zeros((num_q,), jnp.int32),
        "kd": jnp.full((num_q, 3), 0.5, jnp.float32),
        "ks": jnp.zeros((num_q, 3), jnp.float32),
        "ns": jnp.ones((num_q,), jnp.float32),
    }
    ones = jnp.ones((num_q,), jnp.float32)
    active = jnp.ones((num_q,), bool)
    eps = float(pm_radius) * 0.01

    @jax.jit
    def floor_fn(x):
        def body(c, _):
            return c * 1.000001 + 0.5, None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return c

    t_floor, _ = timed(floor_fn, jnp.float32(1.0))
    log(f"floor (K={K} trivial): {t_floor:8.2f} ms total")

    grid = jax.block_until_ready(pallas_merge.build_merge_grid(
        cache.pos, valid, pm_radius, cache.w_out, cache.throughput,
        cache.d_vcm, cache.d_vm))

    results = {}
    for mode in ("1", "0"):
        os.environ["IMBA_MERGE_UNION"] = mode

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

        t, out = timed(slope, grid)
        nm = "union " if mode == "1" else "combo "
        results[mode] = float(out)
        log(f"{nm}: {t / K:8.2f} ms/dispatch (K={K} total {t:8.1f} ms, "
            f"sum {float(out):.6e})")

    a, b = results["1"], results["0"]
    rel = abs(a - b) / max(abs(b), 1e-12)
    log(f"sum rel diff union vs combo: {rel:.2e}")
    log("")


main()
