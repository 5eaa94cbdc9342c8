"""Round-4 quality investigation: the BPT/VCM family converges to a
BIASED image vs the cornell golden (curve fit on results/curves_r3/
curve_cornell_bpt.csv: rmse^2 = bias^2 + sigma^2/N gives bias ~ 0.035,
a ~29 dB ceiling — while dedicated PT converges to 39 dB vs the SAME
golden).  No frame budget fixes that; the estimator itself deviates.

Instrument: converge dedicated-PT (trusted truth: 39 dB vs golden) and
BPT against each other at 256^2 on the TPU, bisect by max_path_len
(ml=2: light_hit+NEE+cam_connect only; ml=3 adds the first vertex
connects; ml=10 full) and dump per-technique mean films so the
deviating technique is identified by inspection.  All runs are fused
(N frames per dispatch inside one jit — 256^2 is single-band, no host
syncs).

Writes results/r4_bpt_bias.txt + results/r4_bias/*.npy mean films.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.frontend.engine import estimate_pixel_size, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.render.integrators.vcm import TECHNIQUES, render_vcm_frame
from imbatracer_tpu.scene.build import build_scene

SIZE = int(os.environ.get("IMBA_BIAS_SIZE", "256"))      # CPU smoke: 32
FRAME_DIV = int(os.environ.get("IMBA_BIAS_DIV", "1"))    # CPU smoke: 64
OUT = "/root/repo/results/r4_bpt_bias.txt"
DIR = "/root/repo/results/r4_bias"


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def smooth(img):
    """8x8 (2x2 on smoke sizes) box downsample (H*W,3)->(H/8*W/8,3): kills residual noise so
    rel-RMSE reads the systematic gap."""
    a = img.reshape(SIZE, SIZE, 3)
    k = 8 if SIZE >= 64 else 2
    a = a.reshape(SIZE // k, k, SIZE // k, k, 3).mean(axis=(1, 3))
    return a.reshape(-1, 3)


def compare(name, a, b):
    sa, sb = smooth(a), smooth(b)
    scale = max(float(sa.mean()), 1e-9)
    rel_rmse = float(np.sqrt(((sa - sb) ** 2).mean())) / scale
    mean_ratio = (b.mean(0) / np.maximum(a.mean(0), 1e-12))
    log(f"{name:28s}: rel_rmse(8x8) {rel_rmse*100:6.2f}%   "
        f"mean ratio rgb = {mean_ratio[0]:.4f} {mean_ratio[1]:.4f} "
        f"{mean_ratio[2]:.4f}")
    return rel_rmse


def accumulate(frame_fn, frames, chunk=32, offset=0):
    """Mean film over `frames` frames, `chunk` frames per device dispatch."""
    chunk = max(1, min(chunk, frames))
    frames = (frames // chunk) * chunk  # exact normalisation

    @jax.jit
    def run_chunk(f0):
        def body(k, acc):
            return acc + frame_fn((f0 + k).astype(jnp.uint32))
        return jax.lax.fori_loop(
            0, chunk, body, jnp.zeros((SIZE * SIZE, 3), jnp.float32))

    acc = np.zeros((SIZE * SIZE, 3), np.float64)
    t0 = time.time()
    for f0 in range(offset, offset + frames, chunk):
        acc += np.asarray(run_chunk(jnp.uint32(f0)), np.float64)
    dt = time.time() - t0
    return acc / frames, dt


def main():
    os.makedirs(DIR, exist_ok=True)
    scene, meta = build_scene(
        "/root/reference/test/scenes/cornell/cornell_org.scene", quiet=True)
    settings = RenderSettings(width=SIZE, height=SIZE)
    cam = camera_for_scene(meta, settings)
    max_steps = traversal_steps(meta)
    px = estimate_pixel_size(scene, cam, meta)
    base_radius = jnp.float32(px * settings.radius_factor)
    mat_kinds = tuple(sorted(set(
        int(k) for k in np.asarray(scene.materials.kind))))
    log(f"# bpt bias bisect  backend={jax.default_backend()} "
        f"mode={scene.bvh.mode} size={SIZE}")

    def pt_fn(ml):
        return lambda f: render_pt_frame(scene, cam, f, SIZE, SIZE,
                                         max_len=ml, max_steps=max_steps)

    def vcm_fn(algo, ml, techniques=TECHNIQUES):
        return lambda f: render_vcm_frame(
            scene, cam, f, base_radius, algo=algo, width=SIZE, height=SIZE,
            spp=1, max_len=ml, light_path_count=SIZE * SIZE // 2,
            max_steps=max_steps, mat_kinds=mat_kinds, techniques=techniques)

    films = {}
    runs = [
        ("pt_ml10", pt_fn(10), 1024),
        ("bpt_ml10", vcm_fn("bpt", 10), 384),
        ("pt_ml2", pt_fn(2), 768),
        ("bpt_ml2", vcm_fn("bpt", 2), 384),
        ("pt_ml3", pt_fn(3), 768),
        ("bpt_ml3", vcm_fn("bpt", 3), 384),
        ("lt_ml10", vcm_fn("lt", 10), 384),
    ]
    for name, fn, frames in runs:
        film, dt = accumulate(fn, max(frames // FRAME_DIV, 2))
        films[name] = film
        np.save(f"{DIR}/{name}.npy", film.astype(np.float32))
        log(f"rendered {name:10s} {max(frames // FRAME_DIV, 2):5d} frames in {dt:7.1f}s")

    log("")
    compare("bpt_ml10 vs pt_ml10", films["pt_ml10"], films["bpt_ml10"])
    compare("bpt_ml2  vs pt_ml2", films["pt_ml2"], films["bpt_ml2"])
    compare("bpt_ml3  vs pt_ml3", films["pt_ml3"], films["bpt_ml3"])
    # LT misses camera-hits-emitter paths; compare on non-emitter pixels
    # against PT minus its direct-visible emitter contribution is messy —
    # just record the global ratio for reference.
    compare("lt_ml10  vs pt_ml10", films["pt_ml10"], films["lt_ml10"])

    # Per-technique mean films of full BPT: which one carries the gap?
    log("")
    total = np.zeros_like(films["bpt_ml10"])
    for tech in ("light_hit", "next_event", "connect", "cam_connect"):
        film, dt = accumulate(vcm_fn("bpt", 10, techniques=(tech,)),
                              max(192 // FRAME_DIV, 2))
        np.save(f"{DIR}/bpt_tech_{tech}.npy", film.astype(np.float32))
        total += film
        log(f"technique {tech:12s}: mean {film.mean():.5f}  "
            f"({dt:6.1f}s)")
    compare("sum(techniques) vs bpt", films["bpt_ml10"], total)


if __name__ == "__main__":
    main()
