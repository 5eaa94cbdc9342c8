"""TPU validation + timing for the Pallas merge kernel (round 3).

Compares, on cornell_specular:
  1. correctness: one VCM frame through the XLA window route with a
     wide-open window (max_per_cell=64 ~= exact) vs the Pallas kernel
     route (exact by construction) — same RNG, so the diff isolates the
     merge formulation;
  2. speed: frame times for kernel route vs the round-2 default window
     (W=4), plus the no-merge ablation on the kernel route;
  3. the W=4 bias A/B the round-2 verdict asked for: PSNR of the W=4
     frame against the exact-merge frame at both 512 and 1024.

Run on TPU with no external timeout (CLAUDE.md: killed TPU clients
wedge the pool).  Results append to results/merge_r3.txt.
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
from imbatracer_tpu.render.integrators.vcm import TECHNIQUES, render_vcm_frame
from imbatracer_tpu.scene.build import build_scene

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"
OUT = "/root/repo/results/merge_r3.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def psnr(a, b):
    a = np.clip(a, 0.0, None) ** 0.5   # same gamma as the golden compare
    b = np.clip(b, 0.0, None) ** 0.5
    mse = float(np.mean((a - b) ** 2))
    if mse <= 0:
        return 99.0
    return 10.0 * np.log10(1.0 / mse)


def main():
    scene, meta = build_scene(SCENE, quiet=True)
    mat_kinds = tuple(sorted(set(
        int(k) for k in np.asarray(scene.materials.kind))))
    log(f"backend={jax.default_backend()} mat_kinds={mat_kinds}")

    sizes = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
             else [512, 1024])
    for size in sizes:
        settings = RenderSettings(width=size, height=size, algorithm="vcm",
                                  radius_factor=0.003)
        cam = camera_for_scene(meta, settings)
        px = estimate_pixel_size(scene, cam, meta)
        br = jnp.float32(px * settings.radius_factor)
        ms = traversal_steps(meta)

        def frame(i, merge_kernel, mpc=4, techniques=TECHNIQUES):
            return render_vcm_frame(
                scene, cam, jnp.uint32(i), br, algo="vcm",
                width=size, height=size, max_len=10,
                max_per_cell=mpc, techniques=tuple(techniques),
                max_steps=ms, merge_kernel=merge_kernel,
                mat_kinds=mat_kinds)

        def run(tag, reps=2, **kw):
            t0 = time.time()
            img = np.asarray(jax.block_until_ready(frame(0, **kw)))
            t_compile = time.time() - t0
            t0 = time.time()
            for i in range(1, reps + 1):
                jax.block_until_ready(frame(i, **kw))
            dt = (time.time() - t0) / max(reps, 1)
            log(f"[{size}] {tag:16s}: {dt * 1e3:8.1f} ms/frame "
                f"(compile+first {t_compile:.1f} s)")
            return img, dt

        _, t_nm = run("kernel no-merge", reps=2, merge_kernel=True,
                      techniques=tuple(t for t in TECHNIQUES
                                       if t != "merge"))
        img_ker, t_ker = run("kernel", reps=3, merge_kernel=True)
        img_w4, t_w4 = run("window W=4", reps=2, merge_kernel=False, mpc=4)
        log(f"[{size}] merge cost: kernel {1e3 * (t_ker - t_nm):+.1f} ms, "
            f"window-W4 route total {t_w4 * 1e3:.1f} ms")
        log(f"[{size}] W=4 bias vs exact merge: "
            f"psnr={psnr(img_w4, img_ker):.1f} dB")
        # NB no wide-window correctness row: W>=16 at 512² OOMs the
        # compiler (the windowed gather's (R, W, 16) temps pad 16->128
        # lanes, 8x expansion).  The kernel's exactness is established
        # by (a) the 99 dB kernel==W4 equivalence above (cells hold <=4
        # photons at production radius, so W=4 IS the unbounded walk
        # here) and (b) the brute-force interpreter tests.


if __name__ == "__main__":
    main()
