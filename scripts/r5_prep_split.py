"""Stage split of the merge dispatch's XLA prep (~32 ms at 262k queries).

r5_merge_split2 measured prep 32 ms + kernel 49 ms (overlap -> 67 full).
If the PT sweep (r5_merge_pt.py) shrinks the kernel, prep becomes the
dominant half.  This times the prep cumulatively:

  keys    — combo-key math only (cell anchors, clamp dedup)
  sortkey — + the full-width lax.sort for perm and the scatter inv_perm
  qrec    — + the 40-col qrec build and the row gather qrec[perm]
  spans   — + the method="sort" searchsorted span bounds  (== full prep)

Each stage consumes its outputs nonlinearly.  Stage deltas attribute
the cost (modulo XLA fusion drift between the jits — cross-check the
final stage against r5_merge_split2's prep-only number).

Usage: python scripts/r5_prep_split.py [cpu]
Appends to results/r5_prep_split.txt.
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
from imbatracer_tpu.core.sampling import local_coordinates

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"
OUT = "/root/repo/results/r5_prep_split.txt"
SIZE = 128 if CPU else 1024
NUM_Q = (1 << 12) if CPU else vcm_mod.BAND_RAYS
REPS = 2 if CPU else 10


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


def make_stage(stage, grid, qpos, normal, gn, w_out, params, active):
    """Prep stages, mirroring pallas_merge.merge_contrib's XLA prep."""
    GRID = pallas_merge.GRID
    BLKQ = pallas_merge.BLKQ
    PT = pallas_merge.PT
    QREC_W = pallas_merge.QREC_W
    num_r = qpos.shape[0]
    ones = jnp.ones((num_r,), jnp.float32)

    def fn(g):
        cellf = (qpos - g.bbox_min) * g.inv_cell
        m = jnp.floor(cellf - 0.5).astype(jnp.int32)
        a0 = jnp.clip(m, 0, GRID - 1)
        a1 = jnp.clip(m + 1, 0, GRID - 1)
        x0, y0, z0 = a0[:, 0], a0[:, 1], a0[:, 2]
        x1, y1 = a1[:, 0], a1[:, 1]
        k00 = (x0 * GRID + y0) * GRID + z0
        k01 = (x0 * GRID + y1) * GRID + z0
        k10 = (x1 * GRID + y0) * GRID + z0
        k11 = (x1 * GRID + y1) * GRID + z0
        same_x = x1 == x0
        same_y = y1 == y0
        inval = jnp.int32(-2)
        k01 = jnp.where(same_y, inval, k01)
        k10 = jnp.where(same_x, inval, k10)
        k11 = jnp.where(same_x | same_y, inval, k11)
        combo_keys = [jnp.where(active, k, inval)
                      for k in (k00, k01, k10, k11)]
        if stage == "keys":
            return sum(jnp.sum(k * k) for k in combo_keys)

        sort_key = jnp.where(active, combo_keys[0], jnp.int32(1 << 30))
        iota = jnp.arange(num_r, dtype=jnp.int32)
        _, perm = jax.lax.sort((sort_key, iota), num_keys=1)
        inv_perm = jnp.zeros_like(iota).at[perm].set(
            iota, unique_indices=True)
        if stage == "sortkey":
            return (sum(jnp.sum(k * k) for k in combo_keys)
                    + jnp.sum(perm * inv_perm))

        t, b = local_coordinates(normal)
        lo = jnp.stack(
            [jnp.sum(w_out * t, axis=-1), jnp.sum(w_out * b, axis=-1),
             jnp.sum(w_out * normal, axis=-1)], axis=-1)
        qrec = jnp.concatenate(
            [
                qpos, t, b, normal, gn, lo,
                jnp.sum(w_out * gn, axis=-1)[:, None],
                ones[:, None], ones[:, None],
                params["kind"].astype(jnp.float32)[:, None],
                params["kd"], params["ks"], params["ns"][:, None],
                jnp.stack([k.astype(jnp.float32) for k in combo_keys],
                          axis=1),
                active.astype(jnp.float32)[:, None],
                jnp.zeros((num_r, QREC_W - 34), jnp.float32),
            ],
            axis=1,
        )
        qrec_s = qrec[perm]
        ck_s = jnp.stack(combo_keys, axis=1)[perm]
        if stage == "qrec":
            return (jnp.sum(qrec_s * qrec_s) + jnp.sum(ck_s * ck_s)
                    + jnp.sum(perm * inv_perm))

        num_b = qrec_s.shape[0] // BLKQ
        ck_blk = ck_s.reshape(num_b, BLKQ, 4)
        valid_k = ck_blk >= 0
        lo_k = jnp.min(jnp.where(valid_k, ck_blk, jnp.int32(1 << 30)),
                       axis=1)
        hi_k = jnp.max(jnp.where(valid_k, ck_blk, jnp.int32(-1)),
                       axis=1) + 1
        bounds = jnp.concatenate([lo_k.reshape(-1), hi_k.reshape(-1) + 1])
        se = jnp.searchsorted(g.keys, bounds, side="left",
                              method="sort").astype(jnp.int32)
        start = se[: num_b * 4].reshape(num_b, 4)
        end = se[num_b * 4:].reshape(num_b, 4)
        t0_ = start // PT
        nt = jnp.where(end > start, (end - 1) // PT - t0_ + 1, 0)
        spans = jnp.concatenate(
            [t0_, nt], axis=1).astype(jnp.int32).reshape(num_b, 1, 8)
        return (jnp.sum(qrec_s * qrec_s) + jnp.sum(spans * spans)
                + jnp.sum(perm * inv_perm))

    return jax.jit(fn)


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    scene, meta = build_scene(SCENE, quiet=True)
    settings = RenderSettings(width=SIZE, height=SIZE, algorithm="vcm",
                              radius_factor=2.0)
    lpc = settings.resolved_light_path_count()
    if CPU:
        lpc = 1 << 12
    cam = camera_for_scene(meta, settings)
    px = estimate_pixel_size(scene, cam, meta)
    base_radius = jnp.float32(px * settings.radius_factor)
    cache_capacity = 2 * lpc
    pm_radius, mis_eta_vc, _ = vcm_mod._mis_constants(
        jnp.uint32(0), base_radius, lpc, "vcm")
    log(f"# r5_prep_split size={SIZE} lpc={lpc} num_q={NUM_Q} reps={REPS} "
        f"backend={jax.default_backend()}")

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
    grid = jax.block_until_ready(pallas_merge.build_merge_grid(
        cache.pos, valid, pm_radius, cache.w_out, cache.throughput,
        cache.d_vcm, cache.d_vm))

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
    active = jnp.ones((NUM_Q,), bool)

    prev = 0.0
    for stage in ("keys", "sortkey", "qrec", "spans"):
        fn = make_stage(stage, grid, qpos, nrm, nrm, wo, params, active)
        t, _ = timed(fn, grid)
        log(f"{stage:8s}: {t:8.2f} ms  (+{t - prev:7.2f})")
        prev = t
    log("")


if __name__ == "__main__":
    main()
