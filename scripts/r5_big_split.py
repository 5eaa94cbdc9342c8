"""Round-5: attribute the 48k-tri stream-mode PT frame cost (VERDICT r4
next-step #2 — the real-BVH frame targets: 48k < 1.2 s, 1080p < 6 s).

Same ablation method as scripts/profile_pt_split.py (static knockouts,
XLA DCEs the removed component), but on the bench_big scene
(make_big_scene(4000), 1024², max_len 6, stream mode).  Ablation rows
force the BANDED path (ablate disables compaction in render_pt_frame),
so the first two rows bracket it: default (compaction ON) vs banded.

Env knob rows (IMBA_SHADOW_DEFER etc.) need one process per value (the
flag is read at trace time inside the jitted band driver) — the chain
script runs those as separate invocations.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.scene.procedural import make_big_scene

OUT = "/root/repo/results/r5_big_split.txt"
SIZE = 1024
MAX_LEN = 6
REPS = 4


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def time_frames(fn, reps=REPS):
    film = fn(0)
    jax.block_until_ready(film)
    t0 = time.time()
    out = None
    for i in range(1, reps + 1):
        out = fn(i)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    scene, meta = make_big_scene(4000)
    settings = RenderSettings(width=SIZE, height=SIZE, max_path_len=MAX_LEN)
    cam = camera_for_scene(meta, settings)
    log(f"# big split  backend={jax.default_backend()} mode={scene.bvh.mode} "
        f"tris={meta.num_tris} size={SIZE} max_len={MAX_LEN} reps={REPS} "
        f"defer={os.environ.get('IMBA_SHADOW_DEFER', '0')} "
        f"compact={os.environ.get('IMBA_PT_COMPACT', 'auto')}")

    film, n_rays = render_pt_frame(scene, cam, jnp.uint32(0), SIZE, SIZE,
                                   max_len=MAX_LEN, with_stats=True)
    n_rays = int(n_rays)
    log(f"# rays/frame (closest+shadow) = {n_rays}")

    # Default route (mode-adaptive compaction).
    def fr_def(i):
        return render_pt_frame(scene, cam, jnp.uint32(i), SIZE, SIZE,
                               max_len=MAX_LEN)
    ms = time_frames(fr_def)
    log(f"default       : {ms:7.1f} ms/frame "
        f"({n_rays / (ms / 1e3) / 1e6:.2f} Mrays/s)")

    if os.environ.get("IMBA_BIG_ABLATE", "1") == "0":
        return

    variants = [
        ("banded_full", ()),
        ("no_shadow", ("shadow",)),                 # - NEE any_hit
        ("no_nee", ("nee",)),                       # - NEE math too
        ("no_interaction", ("interaction",)),       # - shade-rec fetch
        ("trace_only", ("nee", "emit", "bounce")),  # closest_hit loop only
        ("skeleton", ("nee", "emit", "bounce", "trace")),
    ]
    base = None
    for name, abl in variants:
        def fr(i, abl=abl):
            return render_pt_frame(scene, cam, jnp.uint32(i), SIZE, SIZE,
                                   max_len=MAX_LEN, ablate=abl)
        ms = time_frames(fr)
        extra = ""
        if base is None:
            base = ms
        else:
            extra = f"  (delta vs banded {ms - base:+7.1f} ms)"
        log(f"{name:14s}: {ms:7.1f} ms/frame{extra}")


if __name__ == "__main__":
    main()
