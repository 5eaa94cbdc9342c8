"""Independent-estimator oracle for the indirect BPT bias (r4_bias4
follow-up): which side is wrong, PT or BPT?

LT (light tracing + camera splat) shares NO MIS machinery with either
(every weight is 1) and matched PT to 0.5-0.8% on cornell_org
(r4_bpt_bias + film analysis, non-emitter pixels).  On indirect the
emitter is never directly visible, so LT vs PT is a clean whole-image
comparison:

  lt == pt  != bpt  ->  the bias is in the multi-technique MIS mixing
                        (and our transcription matches the reference's
                        algebra, so the reference golden — rendered
                        with ITS bpt — should disagree with pt the
                        same way; cross-check r4_pt_goldens indirect).
  lt == bpt != pt   ->  dedicated PT deviates on this scene (unlikely:
                        39 dB vs the org golden).

Writes results/r4_bias5.txt + films in results/r4_bias/.
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
from imbatracer_tpu.render.integrators.vcm import render_vcm_frame
from imbatracer_tpu.scene.build import build_scene

SIZE = int(os.environ.get("IMBA_BIAS_SIZE", "256"))
FRAME_DIV = int(os.environ.get("IMBA_BIAS_DIV", "1"))
OUT = "/root/repo/results/r4_bias5.txt"
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


def compare(name, a, b):
    k = 8 if SIZE >= 64 else 2
    sm = lambda x: x.reshape(SIZE // k, k, SIZE // k, k, 3).mean((1, 3))
    sa, sb = sm(a.reshape(SIZE, SIZE, 3)), sm(b.reshape(SIZE, SIZE, 3))
    scale = max(float(sa.mean()), 1e-9)
    rr = float(np.sqrt(((sa - sb) ** 2).mean())) / scale
    log(f"{name:22s}: rel_rmse(8x8) {rr*100:6.2f}%   "
        f"mean ratio {float(b.mean()/a.mean()):.4f}")


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
    log(f"# bias5 LT oracle  backend={jax.default_backend()} size={SIZE} "
        f"scene=cornell_indirect")

    def pt_fn(f):
        return render_pt_frame(scene, cam, f, SIZE, SIZE,
                               max_len=10, max_steps=max_steps)

    def tmpl(algo):
        return lambda f: render_vcm_frame(
            scene, cam, f, base_radius, algo=algo, width=SIZE, height=SIZE,
            spp=1, max_len=10, light_path_count=SIZE * SIZE // 2,
            max_steps=max_steps, mat_kinds=mat_kinds)

    runs = [("pt", pt_fn, 768), ("lt", tmpl("lt"), 768),
            ("bpt", tmpl("bpt"), 384)]
    films = {}
    for name, fn, frames in runs:
        film, dt = accumulate(fn, max(frames // FRAME_DIV, 2))
        films[name] = film
        np.save(f"{DIR}/b5_ind_{name}.npy", film.astype(np.float32))
        log(f"rendered {name:4s} {max(frames // FRAME_DIV, 2):5d} frames "
            f"in {dt:7.1f}s")
    log("")
    compare("lt  vs pt", films["pt"], films["lt"])
    compare("bpt vs pt", films["pt"], films["bpt"])
    compare("bpt vs lt", films["lt"], films["bpt"])


if __name__ == "__main__":
    main()
