"""Post-specialization VCM frame-cost split at 1024² (trimmed).

profile_vcm.py's full sweep is 8 remote compiles; through the tunnel that
is hours.  This runs the 5 variants that decide the next lever for the
30 s quality row (r4_spec_q_vcm.csv: 3.3 s/frame -> 10 samples -> 25.6 dB):

  full            — current defaults (spec + lpc cap + pruning)
  -merge          — is the photon-merge grid the cost?
  -connect        — is the connection shading chain the cost?
  -next_event     — NEE + its shadow rays
  light_hit only  — camera-pass floor (traversal + emitter hits only)

Appends to results/r4_vcmsplit.txt.
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.frontend.engine import estimate_pixel_size, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.vcm import TECHNIQUES, render_vcm_frame
from imbatracer_tpu.scene.build import build_scene

SCENE = "/root/reference/test/scenes/cornell/cornell_specular.scene"
OUT = "/root/repo/results/r4_vcmsplit.txt"
SIZE = 1024


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def time_frame(scene, cam, base_radius, techniques, max_steps, lpc,
               mat_kinds, reps=3):
    def frame(i):
        return render_vcm_frame(
            scene, cam, jnp.uint32(i), base_radius, algo="vcm",
            width=SIZE, height=SIZE, max_len=10,
            light_path_count=lpc, mat_kinds=mat_kinds,
            techniques=tuple(techniques), max_steps=max_steps,
        )

    jax.block_until_ready(frame(0))
    t0 = time.time()
    for i in range(1, reps + 1):
        jax.block_until_ready(frame(i))
    return (time.time() - t0) / reps * 1e3


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    scene, meta = build_scene(SCENE, quiet=True)
    # Mirror the cornell_vcm QUALITY-ROW config (tools/run_bench.py):
    # radius_factor 2.0 (reference bench default), the capped default
    # light-path count (2^17 for merging algos), and the engine's
    # static mat_kinds so the merge kernel is specialized — the split
    # must decompose the same 3.3 s frame the 30 s row pays for.
    import numpy as np
    settings = RenderSettings(width=SIZE, height=SIZE, algorithm="vcm",
                              radius_factor=2.0)
    lpc = settings.resolved_light_path_count()
    mat_kinds = tuple(sorted(set(
        int(k) for k in np.asarray(scene.materials.kind))))
    cam = camera_for_scene(meta, settings)
    px = estimate_pixel_size(scene, cam, meta)
    br = jnp.float32(px * settings.radius_factor)
    ms = traversal_steps(meta)
    log(f"# r4_vcmsplit size={SIZE} scene=cornell_specular lpc={lpc} "
        f"radius_factor={settings.radius_factor} mat_kinds={mat_kinds} "
        f"techniques={TECHNIQUES}")

    full = time_frame(scene, cam, br, TECHNIQUES, ms, lpc, mat_kinds)
    log(f"full                : {full:8.1f} ms")
    for drop in ("merge", "connect", "next_event"):
        sub = tuple(t for t in TECHNIQUES if t != drop)
        t = time_frame(scene, cam, br, sub, ms, lpc, mat_kinds)
        log(f"without {drop:12s}: {t:8.1f} ms  (delta {full - t:+7.1f})")
    t = time_frame(scene, cam, br, ("light_hit",), ms, lpc, mat_kinds)
    log(f"light_hit only      : {t:8.1f} ms  (all-technique cost "
        f"{full - t:+7.1f})")


if __name__ == "__main__":
    main()
