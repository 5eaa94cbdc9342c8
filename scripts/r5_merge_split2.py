"""Second-stage merge split: prep-only vs kernel-only vs span stats.

r5_merge_split.py's tiny-radius control changes the grid geometry (cell
size floors at ext/256, build_merge_grid), so its fixed-vs-walk split is
confounded.  This probe times the REAL pipeline in three separable
pieces at the production radius:

  prep    — the XLA query prep alone (qrec build, two full-width sorts,
            permutation gathers, searchsorted spans) with the kernel
            replaced by a zeros placeholder of the same shape
  kernel  — pl.pallas_call alone on PRE-COMPUTED (qrec_s, spans, scal)
            device arrays (the per-block DMA floor + photon walk)
  full    — merge_contrib end to end (cross-check: ~ prep + kernel)

plus span statistics (sum/mean/max tiles per block-combo) that predict
the kernel's tile-walk volume, and a BLKQ sensitivity row (the block
count sets the kernel floor; spans per block scale with the block's
query key range).

Usage: python scripts/r5_merge_split2.py [cpu]
Appends to results/r5_merge_split2.txt.
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
OUT = "/root/repo/results/r5_merge_split2.txt"
SIZE = 128 if CPU else 1024
NUM_Q = (1 << 12) if CPU else vcm_mod.BAND_RAYS
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


def prep(grid, qpos, normal, gn, w_out, params, d_vcm, d_vm, active):
    """merge_contrib's XLA prep, verbatim (pallas_merge.py:432-516)."""
    GRID = pallas_merge.GRID
    BLKQ = pallas_merge.BLKQ
    PT = pallas_merge.PT
    QREC_W = pallas_merge.QREC_W
    num_r = qpos.shape[0]
    cellf = (qpos - grid.bbox_min) * grid.inv_cell
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
    combo_keys = [k00, k01, k10, k11]
    combo_keys = [jnp.where(active, k, inval) for k in combo_keys]
    sort_key = jnp.where(active, k00, jnp.int32(1 << 30))
    iota = jnp.arange(num_r, dtype=jnp.int32)
    _, perm = jax.lax.sort((sort_key, iota), num_keys=1)
    inv_perm = jnp.zeros_like(iota).at[perm].set(iota, unique_indices=True)
    t, b = local_coordinates(normal)
    lo = jnp.stack(
        [jnp.sum(w_out * t, axis=-1), jnp.sum(w_out * b, axis=-1),
         jnp.sum(w_out * normal, axis=-1)], axis=-1)
    qrec = jnp.concatenate(
        [
            qpos, t, b, normal, gn, lo,
            jnp.sum(w_out * gn, axis=-1)[:, None],
            d_vcm[:, None], d_vm[:, None],
            params["kind"].astype(jnp.float32)[:, None],
            params["kd"], params["ks"], params["ns"][:, None],
            jnp.stack([k.astype(jnp.float32) for k in combo_keys], axis=1),
            active.astype(jnp.float32)[:, None],
            jnp.zeros((num_r, QREC_W - 34), jnp.float32),
        ],
        axis=1,
    )
    qrec_s = qrec[perm]
    ck_s = jnp.stack(combo_keys, axis=1)[perm]
    num_b = qrec_s.shape[0] // BLKQ
    ck_blk = ck_s.reshape(num_b, BLKQ, 4)
    valid_k = ck_blk >= 0
    lo_k = jnp.min(jnp.where(valid_k, ck_blk, jnp.int32(1 << 30)), axis=1)
    hi_k = jnp.max(jnp.where(valid_k, ck_blk, jnp.int32(-1)), axis=1) + 1
    bounds = jnp.concatenate([lo_k.reshape(-1), hi_k.reshape(-1) + 1])
    se = jnp.searchsorted(grid.keys, bounds, side="left",
                          method="sort").astype(jnp.int32)
    start = se[: num_b * 4].reshape(num_b, 4)
    end = se[num_b * 4 :].reshape(num_b, 4)
    t0 = start // PT
    nt = jnp.where(end > start, (end - 1) // PT - t0 + 1, 0)
    spans = jnp.concatenate(
        [t0, nt], axis=1).astype(jnp.int32).reshape(num_b, 1, 8)
    return qrec_s, spans, inv_perm


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
    log(f"# r5_merge_split2 size={SIZE} lpc={lpc} num_q={NUM_Q} "
        f"mat_kinds={mat_kinds} reps={REPS} backend={jax.default_backend()}")

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
    valid = jnp.arange(cache_capacity) < cache.count
    grid = jax.jit(lambda r: pallas_merge.build_merge_grid(
        cache.pos, valid, r, cache.w_out, cache.throughput,
        cache.d_vcm, cache.d_vm))(pm_radius)
    grid = jax.block_until_ready(grid)
    log(f"photons {n_photons}/{cache_capacity}, tiles "
        f"{grid.tiles.shape[0]}")

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

    # --- full pipeline --------------------------------------------------
    @jax.jit
    def full(g):
        out = pallas_merge.merge_contrib(
            g, qpos, nrm, nrm, wo, params, ones, ones, active,
            mis_eta_vc, kinds=mat_kinds, ppm=False)
        return jnp.sum(out * out)

    t_full, _ = timed(full, grid)
    log(f"full merge_contrib  : {t_full:8.2f} ms / {NUM_Q} queries")

    # --- prep only ------------------------------------------------------
    @jax.jit
    def prep_only(g):
        qrec_s, spans, inv_perm = prep(g, qpos, nrm, nrm, wo, params,
                                       ones, ones, active)
        # consume every output nonlinearly
        return (jnp.sum(qrec_s * qrec_s) + jnp.sum(spans * spans)
                + jnp.sum(inv_perm * inv_perm))

    t_prep, _ = timed(prep_only, grid)
    log(f"prep only           : {t_prep:8.2f} ms  (qrec + sorts + spans)")

    # --- kernel only on precomputed inputs -------------------------------
    qrec_s, spans, inv_perm = jax.block_until_ready(
        jax.jit(lambda g: prep(g, qpos, nrm, nrm, wo, params, ones, ones,
                               active))(grid))
    scal = jnp.stack(
        [grid.radius_sqr, jnp.asarray(mis_eta_vc, jnp.float32)]
    ).reshape(1, 1, 2)

    @jax.jit
    def kernel_only(q, s, sc, tiles):
        out = pallas_merge._merge_call(q, s, sc, tiles, mat_kinds, False)
        return jnp.sum(out * out)

    t_kern, _ = timed(kernel_only, qrec_s, spans, scal, grid.tiles)
    log(f"kernel only         : {t_kern:8.2f} ms  (DMA floor + walk)")
    log(f"cross-check prep+kernel = {t_prep + t_kern:8.2f} vs full "
        f"{t_full:8.2f}")

    # --- span statistics --------------------------------------------------
    nt = np.asarray(spans).reshape(-1, 8)[:, 4:8]
    log(f"span tiles/block-combo: sum {nt.sum()}  mean {nt.mean():.2f}  "
        f"max {nt.max()}  blocks {nt.shape[0]}  "
        f"nonzero combos {(nt > 0).sum()}")
    proc_elems = nt.sum() * pallas_merge.BLKQ * pallas_merge.PT
    log(f"pair slots walked   : {proc_elems/1e6:.1f} M "
        f"({proc_elems * 60 / 1e9:.1f} GFLOP at ~60 flop/pair)")

    # --- BLKQ sweep (full pipeline only; new kernel compile per value) --
    base_blkq = pallas_merge.BLKQ
    for blkq in (512, 1024):
        if CPU:
            break
        pallas_merge.BLKQ = blkq

        @jax.jit
        def full_b(g):
            out = pallas_merge.merge_contrib(
                g, qpos, nrm, nrm, wo, params, ones, ones, active,
                mis_eta_vc, kinds=mat_kinds, ppm=False)
            return jnp.sum(out * out)

        t_b, _ = timed(full_b, grid)
        log(f"full @ BLKQ={blkq:5d}  : {t_b:8.2f} ms")
    pallas_merge.BLKQ = base_blkq
    log("")


if __name__ == "__main__":
    main()
