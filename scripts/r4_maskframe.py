"""One-configuration masked-frame timing for env-knob sweeps.

Renders the leaf-canopy PT frame (1024², masked) twice — full and with
the NEE shadow trace ablated — and appends both times plus the knob
state to results/r4_maskframe.txt.  Knobs are read by the modules at
import, so each variant runs in its own process (driven by
scripts/r4_chain21.sh):

  IMBA_MASK_REC        0 = chained alpha gathers (old), 1 = narrow record
  IMBA_MASK_PREPASS    0 = khit loop only, 1 = single-hit prepass first
  IMBA_MASK_MAX_ROUNDS 0 = prepass only (IMAGE WRONG, timing only)
  IMBA_KHIT_K          nearest-hit slot count (default 4)
  IMBA_MASK_KHIT       0 = per-layer re-trace path
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from imbatracer_tpu.frontend.engine import traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators import pt as pt_mod
from imbatracer_tpu.scene.procedural import make_leaf_scene

OUT = "/root/repo/results/r4_maskframe.txt"
SIZE = 1024


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def frame_time(scene, cam, max_steps, ablate=(), frames=6):
    def frame(i):
        return pt_mod.render_pt_frame(
            scene, cam, jnp.uint32(i), SIZE, SIZE, spp=1, max_len=6,
            has_masks=True, max_steps=max_steps, ablate=ablate)

    film = frame(0)
    jax.block_until_ready(film)
    t0 = time.time()
    for i in range(1, frames + 1):
        film = frame(i)
    jax.block_until_ready(film)
    return (time.time() - t0) / frames * 1e3


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    knobs = " ".join(
        f"{k.split('IMBA_')[1].lower()}={os.environ.get(k, '-')}"
        for k in ("IMBA_MASK_REC", "IMBA_MASK_PREPASS",
                  "IMBA_MASK_MAX_ROUNDS", "IMBA_KHIT_K", "IMBA_MASK_KHIT"))
    scene, meta = make_leaf_scene(num_leaves=6000)
    max_steps = traversal_steps(meta)
    settings = RenderSettings(width=SIZE, height=SIZE, spp=1, max_path_len=6)
    cam = camera_for_scene(meta, settings)

    ms_ns = frame_time(scene, cam, max_steps, ablate=("shadow",))
    ms_f = frame_time(scene, cam, max_steps)
    log(f"maskframe [{knobs}]: noshadow {ms_ns:7.1f} ms  full {ms_f:7.1f} ms")


if __name__ == "__main__":
    main()
