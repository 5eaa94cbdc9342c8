"""Full cost budget of the VCM quality row (cornell_specular 1024², vcm,
radius_factor 2.0, lpc 131072, frame 3232 ms).

The r5_floor_split probe showed the 'light_hit floor' (1126 ms) splits
into light band 495 + camera light_hit bands 4x206 — i.e. the vmem
traversal dispatches, not the merge, may be the bigger half.  This probe
pins every component in one process:

  1. slope-method vmem dispatch absolutes: closest_hit on a coherent
     (camera) and a scattered 262k batch, any_hit on a 524k batch (the
     camera pass batches NEE+connect shadows into one 2x-wide dispatch)
  2. light-band ablations: full vs no-cam_connect (isolates the
     _connect_to_camera eval + any_hit) vs algo=lt (isolates the
     per-bounce cache append scatter)
  3. camera-band technique deltas at band level (chain22 measured them
     at frame level where fusion reshaping confused the signs):
     light_hit / +next_event / +merge / full
  4. merge join statistics on the real photon grid with first-hit
     queries: blocks, tile-steps, span slots per combo, and the
     tile-step count after per-block interval-union dedup (how much a
     shared walk over the 4 combo spans would save)
  5. light-path survival per bounce (cache path_length histogram) —
     sizes the light-pass compaction lever.

Usage: python scripts/r5_qrow_split.py [cpu]
Appends to results/r5_qrow_split.txt.
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
from imbatracer_tpu.render.light_cache import canonicalize, empty_cache
from imbatracer_tpu.render.traverse import any_hit, closest_hit
from imbatracer_tpu.scene.build import build_scene
from imbatracer_tpu.ops import pallas_merge

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"
OUT = "/root/repo/results/r5_qrow_split.txt"
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
        lpc = 1 << 12
    mat_kinds = tuple(sorted(set(
        int(k) for k in np.asarray(scene.materials.kind))))
    cam = camera_for_scene(meta, settings)
    px = estimate_pixel_size(scene, cam, meta)
    base_radius = jnp.float32(px * settings.radius_factor)
    cache_capacity = 2 * lpc
    pm_radius, mis_eta_vc, _ = vcm_mod._mis_constants(
        jnp.uint32(0), base_radius, lpc, "vcm")
    ms_steps = traversal_steps(meta)
    num_pixels = SIZE * SIZE
    band = min(vcm_mod.BAND_RAYS, num_pixels)
    num_bands = -(-num_pixels // band)
    num_r = band
    log(f"# r5_qrow_split size={SIZE} lpc={lpc} mat_kinds={mat_kinds} "
        f"max_steps={ms_steps} bvh_mode={scene.bvh.mode} K={K} reps={REPS} "
        f"bands={num_bands} backend={jax.default_backend()}")

    # Floor control.
    @jax.jit
    def floor_fn(x):
        def body(c, _):
            return c * 1.000001 + 0.5, None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return c

    t_floor, _ = timed(floor_fn, jnp.float32(1.0))
    log(f"floor (K={K} trivial):{t_floor:9.2f} ms/sync")

    # ------------------------------------------------------------------
    # 1. vmem dispatch absolutes (slope)
    # ------------------------------------------------------------------
    org0, d0, _, _ = pt_mod.camera_rays(cam, SIZE, SIZE, 1, jnp.uint32(0),
                                        start_pixel=0, count=num_r)
    tmin0 = jnp.zeros((num_r,), jnp.float32)
    hit0 = jax.block_until_ready(closest_hit(
        scene.bvh, org0, d0, tmin0, BIG, active=tmin0 < 1.0,
        max_steps=ms_steps, sort=True))
    hp = org0 + d0 * jnp.where(hit0.prim_id >= 0, hit0.t * 0.999,
                               1.0)[:, None]

    rng = np.random.default_rng(7)
    rd = rng.normal(size=(num_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)

    def slope_closest(org, d, label):
        @jax.jit
        def run():
            def body(c, k):
                tm = jnp.zeros((num_r,), jnp.float32) \
                    + k.astype(jnp.float32) * 1e-7 + c * 0.0
                h = closest_hit(scene.bvh, org, d, tm, BIG,
                                active=tm < 1.0, max_steps=ms_steps,
                                sort=True)
                return c + jnp.sum(1.0 / (1.0 + h.t * h.t)), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(K, dtype=jnp.int32))
            return c
        t, _ = timed(run)
        net = (t - t_floor) / K
        log(f"closest {label:9s} {num_r // 1024:4d}k:{net:9.2f} ms/dispatch")

    slope_closest(org0, d0, "coherent")
    slope_closest(hp, rd, "scattered")

    org2 = jnp.concatenate([hp, hp])
    rd2 = jnp.concatenate([rd, -rd])
    tmax2 = jnp.full((2 * num_r,), 2.0, jnp.float32)

    @jax.jit
    def run_any():
        def body(c, k):
            tm = k.astype(jnp.float32) * 1e-7 + jnp.zeros((2 * num_r,))
            occ = any_hit(scene.bvh, org2, rd2, tm, tmax2,
                          active=tm < 1.0, max_steps=ms_steps, sort=True)
            return c + jnp.sum(occ.astype(jnp.float32)) * 1e-6, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(K, dtype=jnp.int32))
        return c

    t, _ = timed(run_any)
    log(f"any_hit scattered {2 * num_r // 1024:4d}k:{(t - t_floor) / K:9.2f}"
        f" ms/dispatch")

    # ------------------------------------------------------------------
    # 2. light-band ablations
    # ------------------------------------------------------------------
    lband = min(vcm_mod.BAND_RAYS, lpc)

    def light_band(algo, techniques, frame):
        cache0 = empty_cache(cache_capacity)
        film, cache = vcm_mod._vcm_light_band(
            scene, cam, frame, base_radius, jnp.int32(0), cache0,
            algo=algo, num_pixels=num_pixels, light_path_count=lpc,
            max_len=MAX_LEN, cache_capacity=cache_capacity,
            has_masks=False, has_bump=False, max_steps=ms_steps,
            techniques=techniques, band_paths=lband)
        return film, cache

    no_cc = tuple(t for t in vcm_mod.TECHNIQUES if t != "cam_connect")
    t_l_full, (_, cache) = timed(
        jax.jit(functools.partial(light_band, "vcm", vcm_mod.TECHNIQUES)),
        jnp.uint32(0))
    t_l_nocc, _ = timed(
        jax.jit(functools.partial(light_band, "vcm", no_cc)), jnp.uint32(0))
    t_l_lt, _ = timed(
        jax.jit(functools.partial(light_band, "lt", vcm_mod.TECHNIQUES)),
        jnp.uint32(0))
    log(f"light band full     :{t_l_full:9.2f} ms  (x{-(-lpc // lband)}"
        f"/frame)")
    log(f"light band no-cc    :{t_l_nocc:9.2f} ms  (cc cost "
        f"{t_l_full - t_l_nocc:+.1f})")
    log(f"light band lt       :{t_l_lt:9.2f} ms  (append cost "
        f"{t_l_full - t_l_lt:+.1f})")

    cache = jax.block_until_ready(jax.jit(canonicalize)(cache))
    n_photons = int(cache.count)
    plen = np.ascontiguousarray(
        np.asarray(cache.packed()[:, 21])).view(np.int32)[:n_photons]
    hist = np.bincount(plen, minlength=MAX_LEN + 2)
    log(f"photons {n_photons}; vertices per path_length "
        f"{hist[2:MAX_LEN + 2].tolist()}")

    valid = jnp.arange(cache_capacity) < cache.count
    grid = jax.block_until_ready(pallas_merge.build_merge_grid(
        cache.pos, valid, pm_radius, cache.w_out, cache.throughput,
        cache.d_vcm, cache.d_vm))

    # ------------------------------------------------------------------
    # 4. merge join statistics (first-hit queries, pure host math)
    # ------------------------------------------------------------------
    qpos = np.asarray(hp)
    active_q = np.asarray(hit0.prim_id >= 0)
    cellf = (qpos - np.asarray(grid.bbox_min)) * float(grid.inv_cell)
    m = np.floor(cellf - 0.5).astype(np.int64)
    G = pallas_merge.GRID
    a0 = np.clip(m, 0, G - 1)
    a1 = np.clip(m + 1, 0, G - 1)
    k00 = (a0[:, 0] * G + a0[:, 1]) * G + a0[:, 2]
    k01 = (a0[:, 0] * G + a1[:, 1]) * G + a0[:, 2]
    k10 = (a1[:, 0] * G + a0[:, 1]) * G + a0[:, 2]
    k11 = (a1[:, 0] * G + a1[:, 1]) * G + a0[:, 2]
    combos = np.stack([k00, k01, k10, k11], axis=1)
    inval = -2
    combos[:, 1] = np.where(a1[:, 1] == a0[:, 1], inval, combos[:, 1])
    combos[:, 2] = np.where(a1[:, 0] == a0[:, 0], inval, combos[:, 2])
    combos[:, 3] = np.where((a1[:, 0] == a0[:, 0]) | (a1[:, 1] == a0[:, 1]),
                            inval, combos[:, 3])
    combos = np.where(active_q[:, None], combos, inval)
    order = np.argsort(np.where(active_q, k00, 1 << 40), kind="stable")
    combos_s = combos[order]
    keys = np.asarray(grid.keys).astype(np.int64)
    PT = pallas_merge.PT
    BLKQ = pallas_merge.BLKQ
    pad = (-num_r) % BLKQ
    if pad:
        combos_s = np.concatenate(
            [combos_s, np.full((pad, 4), inval, np.int64)])
    nb = combos_s.shape[0] // BLKQ
    cb = combos_s.reshape(nb, BLKQ, 4)
    lo = np.min(np.where(cb >= 0, cb, 1 << 40), axis=1)
    hi = np.max(np.where(cb >= 0, cb, -1), axis=1) + 1
    start = np.searchsorted(keys, lo, side="left")
    end = np.searchsorted(keys, hi + 1, side="left")
    t0 = start // PT
    nt = np.where(end > start, (end - 1) // PT - t0 + 1, 0)
    total_steps = int(nt.sum())
    total_slots = int(np.maximum(end - start, 0).sum())
    # interval-union dedup per block: merge the 4 [t0, t0+nt) ranges
    dedup_steps = 0
    for b in range(nb):
        ivs = sorted((int(t0[b, c]), int(t0[b, c] + nt[b, c]))
                     for c in range(4) if nt[b, c] > 0)
        last_end = -1
        for s, e in ivs:
            s = max(s, last_end)
            if e > s:
                dedup_steps += e - s
                last_end = e
    # in-radius pair density: sample 4k queries, count photons within r
    samp = rng.choice(np.where(active_q)[0], size=min(4096, num_r),
                      replace=False)
    ppos = np.asarray(cache.pos)[:n_photons]
    r2 = float(grid.radius_sqr)
    npairs = 0
    for i in samp[:512]:
        d2 = np.sum((ppos - qpos[i]) ** 2, axis=1)
        npairs += int((d2 <= r2).sum())
    log(f"join: blocks {nb} tile-steps {total_steps} "
        f"(slots {total_slots}, pad {total_steps * PT - total_slots}) "
        f"dedup-steps {dedup_steps} "
        f"({100.0 * dedup_steps / max(total_steps, 1):.0f}%)")
    log(f"join: mean in-radius photons/query "
        f"{npairs / 512:.1f} vs pair slots/query "
        f"{total_steps * PT * BLKQ / max(num_r, 1):.0f}")

    # ------------------------------------------------------------------
    # 3. camera-band technique deltas
    # ------------------------------------------------------------------
    def cam_band(techniques, frame):
        return vcm_mod._vcm_camera_band(
            scene, cam, frame, cache, grid, base_radius, algo="vcm",
            width=SIZE, height=SIZE, spp=1, max_len=MAX_LEN,
            light_path_count=lpc, num_connections=1, num_knn=10,
            table_size=2 * cache_capacity, max_per_cell=4,
            has_masks=False, has_bump=False, max_steps=ms_steps,
            techniques=techniques, start_pixel=jnp.int32(0),
            band_pixels=band, mat_kinds=mat_kinds)

    rows = (
        ("light_hit", ("light_hit",)),
        ("lh+nee", ("light_hit", "next_event")),
        ("lh+merge", ("light_hit", "merge")),
        ("lh+connect", ("light_hit", "connect")),
        ("full", vcm_mod.TECHNIQUES),
    )
    base = None
    for label, tech in rows:
        t_cam, _ = timed(
            jax.jit(functools.partial(cam_band, tech)), jnp.uint32(0))
        extra = "" if base is None else f"  (delta {t_cam - base:+.1f})"
        if base is None:
            base = t_cam
        log(f"camera band {label:10s}:{t_cam:9.2f} ms x {num_bands}"
            f"/frame{extra}")

    log("")


if __name__ == "__main__":
    main()
