"""Round-4 headline attribution, pass 2 — FUSED-frame ablations.

The banded split (results/r4_pt_split.txt) attributed oddly large costs
to "emit" (+102 ms) and the NEE shadow trace (+58 ms) — both mostly
elementwise math on a 36-tri dense scene, so the deltas are suspected
to be XLA fusion-boundary shifts of the banded graph, not the math.
This pass re-attributes inside the ONE-dispatch fused frame (the
production path since pt.use_fused_frame) and adds the ablation that
matters for the next lever: "interaction" (the per-bounce shade-record
fetch replaced by synthetic lane-varying values, so its gather DCEs
while all shading math stays live).

Run once per IMBA_TAKE mode (gather | select | mxu): the record fetch
route is chosen at import time.  In non-gather modes only the full
frame is timed (the A/B against gather's full row is the result).

Appends to results/r4_pt_split2.txt.
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
from imbatracer_tpu.ops.take import TAKE_MODE
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.scene.build import build_scene

SCENE = "/root/reference/test/scenes/cornell/cornell_org.scene"
OUT = "/root/repo/results/r4_pt_split2.txt"
SIZE = 1024
REPS = 20


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    scene, meta = build_scene(SCENE, quiet=True)
    settings = RenderSettings(width=SIZE, height=SIZE)
    cam = camera_for_scene(meta, settings)
    log(f"# pt split2 (fused)  backend={jax.default_backend()} "
        f"mode={scene.bvh.mode} tris={meta.num_tris} size={SIZE} "
        f"take={TAKE_MODE}")

    film, n_rays = render_pt_frame(scene, cam, jnp.uint32(0), SIZE, SIZE,
                                   with_stats=True)
    n_rays = int(n_rays)

    variants = [("full", ()),
                ("no_interaction", ("interaction",))]  # - shade-record fetch
    if TAKE_MODE in ("gather", "") or os.environ.get("IMBA_SPLIT_ALL") == "1":
        variants += [
            ("no_shadow", ("shadow",)),            # - NEE any_hit only
            ("no_nee", ("nee",)),                  # - NEE math + shadow
            ("no_emit", ("emit",)),                # - emitter-MIS block
            ("trace_only", ("nee", "emit", "bounce")),
        ]
    if os.environ.get("IMBA_SPLIT_FLOOR") == "1":
        # Decompose the ~32 ms bounce-chain share: RNG chains, Russian
        # roulette, BSDF sampling (each knocked out with lane-varying
        # stand-ins so downstream work stays live).
        variants = [
            ("full", ()),
            ("no_rng", ("rng",)),
            ("no_rr", ("rr",)),
            ("no_bsdf", ("bsdf",)),
            ("no_brm", ("rng", "rr", "bsdf")),     # all three
        ]

    base = None
    for name, abl in variants:
        @partial(jax.jit, static_argnames=())
        def whole_frame(frame, abl=abl):
            return render_pt_frame(scene, cam, frame, SIZE, SIZE,
                                   ablate=abl)

        t0 = time.time()
        jax.block_until_ready(whole_frame(jnp.uint32(0)))
        compile_s = time.time() - t0
        t0 = time.time()
        out = None
        for i in range(1, REPS + 1):
            out = whole_frame(jnp.uint32(i))
        jax.block_until_ready(out)
        ms = (time.time() - t0) / REPS * 1e3
        if base is None:
            base = ms
            extra = f"({n_rays / (ms / 1e3) / 1e6:.1f} Mrays/s)"
        else:
            extra = f"(delta vs full {ms - base:+7.1f} ms)"
        log(f"take={TAKE_MODE:6s} {name:15s}: {ms:7.1f} ms/frame  {extra}"
            f"  [compile {compile_s:.0f}s]")


if __name__ == "__main__":
    main()
