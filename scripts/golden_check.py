"""Render a scene and compare against the reference golden image.

Usage: python scripts/golden_check.py [scene] [golden] [seconds] [algo]
Runs on whatever JAX platform is default (TPU on the bench box).
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.scene.build import build_scene
from imbatracer_tpu.frontend.renderer import (
    ProgressiveRenderer,
    RenderSettings,
    camera_for_scene,
)
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.utils.metrics import load_reference_png, psnr, rmse


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/test/scenes/cornell/cornell_org.scene"
    )
    golden_path = sys.argv[2] if len(sys.argv) > 2 else (
        "/root/reference/test/references/ref_cornell_org.png"
    )
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

    algo = sys.argv[5] if len(sys.argv) > 5 else "pt"
    print("devices:", jax.devices())
    ds, meta = build_scene(scene_path)
    settings = RenderSettings(
        width=size, height=size, max_time_sec=seconds, spp=1, algorithm=algo
    )
    from imbatracer_tpu.frontend.engine import make_frame_fn

    frame_fn, cam = make_frame_fn(ds, meta, settings)
    r = ProgressiveRenderer(frame_fn, settings)
    t0 = time.time()
    r.step()
    jax.block_until_ready(r.accum)
    print(f"first frame (compile): {time.time()-t0:.1f}s")
    img = r.run(quiet=True)
    tag = os.path.basename(scene_path).split(".")[0]
    r.save(f"/tmp/golden_check_{tag}.png")

    ref = load_reference_png(golden_path)
    if ref.shape[:2] != img.shape[:2]:
        print(f"size mismatch: ref {ref.shape} vs img {img.shape}")
        return
    print(f"RMSE: {rmse(img, ref):.5f}  PSNR: {psnr(img, ref):.2f} dB  "
          f"frames: {r.frames}")


if __name__ == "__main__":
    main()
