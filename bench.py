#!/usr/bin/env python
"""Headline benchmark: sustained traversal+shading throughput of the PT
megastep (Mrays/s), the reference's rays/sec metric
(reference: test/run_bench.py:174-199, tile_scheduler.h:59-61).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 500 Mrays/s sustained traversal on a TPU v5e-8 (BASELINE.json);
vs_baseline scales the single-chip measurement by the 8-chip target.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
    from imbatracer_tpu.render.integrators.pt import render_pt_frame

    cornell = "/root/reference/test/scenes/cornell/cornell_org.scene"
    if os.path.exists(cornell):
        from imbatracer_tpu.scene.build import build_scene

        scene, meta = build_scene(cornell)
    else:
        from imbatracer_tpu.scene.procedural import make_cornell_scene

        scene, meta = make_cornell_scene()

    from imbatracer_tpu.frontend.engine import traversal_steps

    size = 1024
    settings = RenderSettings(width=size, height=size, spp=1, max_path_len=10)
    cam = camera_for_scene(meta, settings)
    max_steps = traversal_steps(meta)

    def frame(i):
        return render_pt_frame(
            scene, cam, jnp.uint32(i), size, size,
            spp=1, max_len=settings.max_path_len,
            has_masks=meta.has_masks, with_stats=True, max_steps=max_steps,
        )

    # Warmup/compile.
    film, n_rays = frame(0)
    jax.block_until_ready(film)

    frames = 20
    t0 = time.time()
    total_rays = 0
    for i in range(1, frames + 1):
        film, n_rays = frame(i)
        total_rays += int(n_rays)
    jax.block_until_ready(film)
    elapsed = time.time() - t0

    mrays = total_rays / elapsed / 1e6
    n_chips = max(1, len(jax.devices()))
    print(json.dumps({
        "metric": "pt_megastep_throughput_cornell_1024",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays * (8 / n_chips) / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
