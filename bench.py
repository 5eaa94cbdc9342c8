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

    # Regenerated-wavefront routing was FOLDED in round 4: re-measured
    # after the log-based flush rework it still loses 3x (7.5 vs 24.0
    # Mrays/s, results/r4_regen.txt); mid-frame compaction owns the
    # lane-utilisation role.  render_pt_frame_regen remains as a
    # test-only estimator cross-check (tests/test_regen.py).
    render = render_pt_frame

    def frame(i):
        return render(
            scene, cam, jnp.uint32(i), size, size,
            spp=1, max_len=settings.max_path_len,
            has_masks=meta.has_masks, with_stats=True, max_steps=max_steps,
        )

    # One-dispatch frames (pt.use_fused_frame: 181.9 -> 102.5 ms/frame
    # on this exact workload — the band loop unrolls inside one jit).
    from imbatracer_tpu.render.integrators.pt import (BAND_RAYS,
                                                      use_fused_frame)

    num_bands = -(-size * size // BAND_RAYS)
    if (render is render_pt_frame
            and use_fused_frame(num_bands, settings.max_path_len,
                                getattr(scene.bvh, "mode", ""))):
        frame = jax.jit(frame)

    # Warmup/compile.
    film, n_rays = frame(0)
    jax.block_until_ready(film)

    frames = 20
    t0 = time.time()
    counts = []
    for i in range(1, frames + 1):
        film, n_rays = frame(i)
        # Keep the count on device: an int() here would block on the
        # ~33 ms tunnel readback every frame and serialize dispatches.
        counts.append(n_rays)
    jax.block_until_ready(film)
    elapsed = time.time() - t0
    total_rays = sum(int(c) for c in counts)

    mrays = total_rays / elapsed / 1e6
    n_chips = max(1, len(jax.devices()))

    # Secondary: the same megastep on a big procedural scene (~50k tris,
    # streaming/pair traversal — the number that exercises the general
    # path; the cornell headline uses dense mode).  Recorded to
    # results/bench_big.json so the headline JSON line stays single.
    try:
        big = _big_scene_metric()
        os.makedirs("results", exist_ok=True)
        with open("results/bench_big.json", "w") as f:
            json.dump(big, f)
    except Exception as e:  # never let the secondary kill the headline
        sys.stderr.write(f"big-scene metric failed: {type(e).__name__}\n")

    # Tertiary: BASELINE config-2 proxy — 1920x1080 PT on the
    # full-material-set + env + masks still-life stand-in (VERDICT r3
    # item 6; scene/procedural.make_still_life_like).
    try:
        sl = _still_life_metric()
        os.makedirs("results", exist_ok=True)
        with open("results/bench_1080p.json", "w") as f:
            json.dump(sl, f)
    except Exception as e:
        sys.stderr.write(f"1080p metric failed: {type(e).__name__}\n")

    headline = {
        "metric": "pt_megastep_throughput_cornell_1024",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays * (8 / n_chips) / 500.0, 4),
    }
    try:
        # Mirror for scripts/smoke_check.py (the stdout line stays the
        # single driver-facing record).
        with open("results/bench_headline.json", "w") as f:
            json.dump(headline, f)
    except OSError:
        pass
    print(json.dumps({
        "metric": "pt_megastep_throughput_cornell_1024",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays * (8 / n_chips) / 500.0, 4),
    }))


def _still_life_metric(frames=3):
    """1080p PT on the config-2 proxy (>=100k tris, all six BSDF kinds,
    env + area lights, alpha-masked cards).  Reference workload:
    test/run_bench.py:58-111 config 2."""
    from imbatracer_tpu.frontend.engine import make_frame_fn
    from imbatracer_tpu.frontend.renderer import RenderSettings
    from imbatracer_tpu.scene.procedural import make_still_life_like

    scene, meta = make_still_life_like()
    settings = RenderSettings(width=1920, height=1080, spp=1,
                              algorithm="pt", max_path_len=8)
    frame_fn, _ = make_frame_fn(scene, meta, settings)
    jax.block_until_ready(frame_fn(jnp.uint32(0)))
    t0 = time.time()
    out = None
    for i in range(1, frames + 1):
        out = frame_fn(jnp.uint32(i))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / frames
    return {
        "metric": "pt_frame_ms_still_life_1080p",
        "tris": int(meta.num_tris),
        "mode": scene.bvh.mode,
        "value": round(dt * 1e3, 1),
        "unit": "ms/frame",
    }


def _big_scene_metric(boxes=4000, size=1024, frames=4):
    from imbatracer_tpu.frontend.engine import make_frame_fn
    from imbatracer_tpu.frontend.renderer import RenderSettings
    from imbatracer_tpu.scene.procedural import make_big_scene

    scene, meta = make_big_scene(boxes)
    settings = RenderSettings(width=size, height=size, spp=1,
                              algorithm="pt", max_path_len=6)
    frame_fn, _ = make_frame_fn(scene, meta, settings)
    jax.block_until_ready(frame_fn(jnp.uint32(0)))
    t0 = time.time()
    out = None
    for i in range(1, frames + 1):
        out = frame_fn(jnp.uint32(i))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / frames
    return {
        "metric": "pt_frame_ms_bigscene_1024",
        "tris": int(meta.num_tris),
        "mode": scene.bvh.mode,
        "value": round(dt * 1e3, 1),
        "unit": "ms/frame",
    }


if __name__ == "__main__":
    main()
