"""Round-4 item 2: split the cornell dense-megastep headline cost into
traversal / shading / NEE / dispatch shares (VERDICT r3 "what's weak #1":
the 24 Mrays/s number has never been attributed).

Uses the static `ablate` knob on render_pt_frame (each variant compiles
with a component removed; XLA DCEs everything the removed component fed).
Dense mode is branchless/mask-independent, so per-bounce cost does not
depend on lane liveness and the deltas attribute cleanly.

Also probes the dispatch floor: the banded 1024^2 frame is 4+ device
calls; `whole-frame-in-one-jit` fuses the band loop, `4-frames-in-one-jit`
fuses frames, which bounds host/tunnel dispatch overhead from above.

Writes results incrementally to results/r4_pt_split.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.scene.build import build_scene

SCENE = "/root/reference/test/scenes/cornell/cornell_org.scene"
OUT = "/root/repo/results/r4_pt_split.txt"
SIZE = 1024
REPS = 20


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
    scene, meta = build_scene(SCENE, quiet=True)
    settings = RenderSettings(width=SIZE, height=SIZE)
    cam = camera_for_scene(meta, settings)
    log(f"# pt split  backend={jax.default_backend()} mode={scene.bvh.mode} "
        f"tris={meta.num_tris} size={SIZE} reps={REPS}")

    # Counted rays of the real frame, for Mrays/s conversion.
    film, n_rays = render_pt_frame(scene, cam, jnp.uint32(0), SIZE, SIZE,
                                   with_stats=True)
    n_rays = int(n_rays)
    log(f"# rays/frame (closest+shadow) = {n_rays}")

    variants = [
        ("full", ()),
        ("no_shadow", ("shadow",)),               # - NEE any_hit
        ("no_nee", ("nee",)),                     # - NEE math too
        ("no_nee_emit", ("nee", "emit")),         # - emitter MIS math
        ("trace_only", ("nee", "emit", "bounce")),  # closest_hit loop only
        ("skeleton", ("nee", "emit", "bounce", "trace")),  # rng+camera+film
    ]
    base = None
    for name, abl in variants:
        def fr(i, abl=abl):
            return render_pt_frame(scene, cam, jnp.uint32(i), SIZE, SIZE,
                                   ablate=abl)
        ms = time_frames(fr)
        extra = ""
        if base is None:
            base = ms
            extra = f"  ({n_rays / (ms / 1e3) / 1e6:.1f} Mrays/s)"
        else:
            extra = f"  (delta vs full {ms - base:+7.1f} ms)"
        log(f"{name:14s}: {ms:7.1f} ms/frame{extra}")

    # ---- dispatch-floor probes -----------------------------------------
    # P1: the whole frame (all bands) fused into ONE device dispatch.
    @partial(jax.jit, static_argnames=("reps",))
    def whole_frame(frame, reps=1):
        def body(k, acc):
            return acc + render_pt_frame(scene, cam,
                                         (frame + k).astype(jnp.uint32),
                                         SIZE, SIZE)
        return jax.lax.fori_loop(0, reps, body,
                                 jnp.zeros((SIZE * SIZE, 3), jnp.float32))

    for nfr in (1, 4):
        def fr(i, nfr=nfr):
            return whole_frame(jnp.uint32(i * nfr), reps=nfr)
        t0 = time.time()
        jax.block_until_ready(fr(0))
        compile_s = time.time() - t0
        reps = max(4, REPS // nfr)
        ms = time_frames(fr, reps=reps) / nfr
        log(f"fused_{nfr}_frames: {ms:7.1f} ms/frame "
            f"({n_rays / (ms / 1e3) / 1e6:.1f} Mrays/s, compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
