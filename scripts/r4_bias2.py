"""Bias bisect, step 2: is the shared VCM-template machinery clean?

Step 1 (r4_bpt_bias.py) localised the BPT-vs-PT darkness to SHORT
paths: rel deficit ~3% already at max_path_len=2, where BPT is just
the light_hit / next_event / cam_connect MIS triple.  This step runs
algo="pt" THROUGH the VCM template (engine name vcm_pt: same light_hit
+ next_event estimator as the dedicated tracer, 2-way MIS, no light
pass) against the dedicated PT at identical settings:

- vcm_pt == pt  (to noise)  -> the shared camera-walk/dVCM machinery
  is clean; the deficit lives in the cam_connect technique or the
  3-way weight coupling it introduces.
- vcm_pt != pt              -> the template's own MIS recursion or
  emitter-hit handling deviates; bisect THAT (it also poisons
  bpt/vcm/ppm).

Appends to results/r4_bias2.txt, films to results/r4_bias/.
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
SCENE = os.environ.get(
    "IMBA_BIAS_SCENE",
    "/root/reference/test/scenes/cornell/cornell_org.scene")
WITH_BPT = os.environ.get("IMBA_BIAS_BPT", "0") == "1"
OUT = "/root/repo/results/r4_bias2.txt"
DIR = "/root/repo/results/r4_bias"
TAG = os.path.basename(SCENE).split(".")[0]


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def smooth(img):
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
    for f0 in range(offset, offset + frames, chunk):
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
    log(f"# bias2: vcm_pt vs pt  backend={jax.default_backend()} "
        f"mode={scene.bvh.mode} size={SIZE} scene={TAG}")

    def pt_fn(ml):
        return lambda f: render_pt_frame(scene, cam, f, SIZE, SIZE,
                                         max_len=ml, max_steps=max_steps)

    def tmpl_fn(algo, ml):
        return lambda f: render_vcm_frame(
            scene, cam, f, base_radius, algo=algo, width=SIZE, height=SIZE,
            spp=1, max_len=ml, light_path_count=SIZE * SIZE // 2,
            max_steps=max_steps, mat_kinds=mat_kinds)

    runs = [
        ("pt_ml2", pt_fn(2), 768),
        ("vcmpt_ml2", tmpl_fn("pt", 2), 768),
        ("pt_ml10", pt_fn(10), 768),
        ("vcmpt_ml10", tmpl_fn("pt", 10), 768),
    ]
    if WITH_BPT:
        runs.append(("bpt_ml10", tmpl_fn("bpt", 10), 384))

    films = {}
    for name, fn, frames in runs:
        film, dt = accumulate(fn, max(frames // FRAME_DIV, 2))
        films[name] = film
        np.save(f"{DIR}/{TAG}_{name}.npy", film.astype(np.float32))
        log(f"rendered {name:12s} {max(frames // FRAME_DIV, 2):5d} frames "
            f"in {dt:7.1f}s")

    log("")
    compare("vcmpt_ml2  vs pt_ml2", films["pt_ml2"], films["vcmpt_ml2"])
    compare("vcmpt_ml10 vs pt_ml10", films["pt_ml10"], films["vcmpt_ml10"])
    if WITH_BPT:
        compare("bpt_ml10   vs pt_ml10", films["pt_ml10"], films["bpt_ml10"])


if __name__ == "__main__":
    main()
