"""Localise the seed-stable BPT bias (r4_bias3: indirect +10.6%, corr 1.0).

Every MIS site (init, bounce recursion, connect, cam_connect, NEE,
light_hit) textually matches the reference algebra, so the deviation
must live in an ingredient.  Empirical bisection on cornell_indirect:

  1. Estimator invariants: E[bpt] must not move with num_connections or
     light_path_count.  If it does, the technique whose weight consumes
     that knob (connect / cam_connect via lpc; connect via C) is wrong.
  2. Per-technique films at two lpc values: which technique's share
     moves WITHOUT the total staying fixed.
  3. vcm (merge on) for reference: does merging inherit the bias?

Writes results/r4_bias4.txt + films in results/r4_bias/.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.frontend.engine import estimate_pixel_size, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.render.integrators.vcm import TECHNIQUES, render_vcm_frame
from imbatracer_tpu.scene.build import build_scene

SIZE = int(os.environ.get("IMBA_BIAS_SIZE", "256"))
FRAME_DIV = int(os.environ.get("IMBA_BIAS_DIV", "1"))
OUT = "/root/repo/results/r4_bias4.txt"
DIR = "/root/repo/results/r4_bias"
SCENE = "/root/reference/test/scenes/cornell/cornell_indirect.scene"


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def accumulate(frame_fn, frames, chunk=32):
    chunk = max(1, min(chunk, frames))
    frames = (frames // chunk) * chunk

    @jax.jit
    def run_chunk(f0):
        def body(k, acc):
            return acc + frame_fn((f0 + k).astype(jnp.uint32))
        return jax.lax.fori_loop(
            0, chunk, body, jnp.zeros((SIZE * SIZE, 3), jnp.float32))

    acc = np.zeros((SIZE * SIZE, 3), np.float64)
    t0 = time.time()
    for f0 in range(0, frames, chunk):
        acc += np.asarray(run_chunk(jnp.uint32(f0)), np.float64)
    return acc / frames, time.time() - t0


def main():
    os.makedirs(DIR, exist_ok=True)
    scene, meta = build_scene(SCENE, quiet=True)
    settings = RenderSettings(width=SIZE, height=SIZE)
    cam = camera_for_scene(meta, settings)
    max_steps = traversal_steps(meta)
    px = estimate_pixel_size(scene, cam, meta)
    base_radius = jnp.float32(px * settings.radius_factor)
    mat_kinds = tuple(sorted(set(
        int(k) for k in np.asarray(scene.materials.kind))))
    log(f"# bias4 invariance battery  backend={jax.default_backend()} "
        f"size={SIZE} scene=cornell_indirect")

    def pt_fn(f):
        return render_pt_frame(scene, cam, f, SIZE, SIZE,
                               max_len=10, max_steps=max_steps)

    def bpt_fn(algo="bpt", lpc=SIZE * SIZE // 2, C=1,
               techniques=TECHNIQUES):
        return lambda f: render_vcm_frame(
            scene, cam, f, base_radius, algo=algo, width=SIZE, height=SIZE,
            spp=1, max_len=10, light_path_count=lpc, num_connections=C,
            max_steps=max_steps, mat_kinds=mat_kinds, techniques=techniques)

    pt, dt = accumulate(pt_fn, max(512 // FRAME_DIV, 2))
    pt_mean = pt.mean()
    log(f"pt                     : mean {pt_mean:.5f}  ({dt:6.1f}s)")

    runs = [
        ("bpt base lpc=32k C=1 ", bpt_fn(), 256),
        ("bpt C=4              ", bpt_fn(C=4), 192),
        ("bpt lpc=8192         ", bpt_fn(lpc=8192), 192),
        ("bpt lpc=131072       ", bpt_fn(lpc=131072), 192),
        ("vcm base             ", bpt_fn(algo="vcm"), 192),
    ]
    films = {}
    for name, fn, frames in runs:
        film, dt = accumulate(fn, max(frames // FRAME_DIV, 2))
        films[name] = film
        np.save(f"{DIR}/b4_{name.split()[0]}_{name.split()[1]}.npy",
                film.astype(np.float32))
        log(f"{name}: mean {film.mean():.5f}  ratio_vs_pt "
            f"{film.mean()/pt_mean:.4f}  ({dt:6.1f}s)")

    log("")
    for lpc in (32768, 8192):
        tot = np.zeros_like(pt)
        for tech in ("light_hit", "next_event", "connect", "cam_connect"):
            film, dt = accumulate(
                bpt_fn(lpc=lpc, techniques=(tech,)),
                max(192 // FRAME_DIV, 2))
            np.save(f"{DIR}/b4_tech_{tech}_lpc{lpc}.npy",
                    film.astype(np.float32))
            tot += film
            log(f"tech {tech:12s} lpc={lpc:6d}: mean {film.mean():.5f} "
                f"share {film.mean()/pt_mean:.4f}  ({dt:5.1f}s)")
        log(f"sum(techniques) lpc={lpc}: ratio_vs_pt {tot.mean()/pt_mean:.4f}")
        log("")


if __name__ == "__main__":
    main()
