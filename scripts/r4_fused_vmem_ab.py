"""Does frame fusing help or hurt on a Pallas-traversal (vmem) scene?

The 36-tri fused A/B (results/r4_chain5.log, r4_vmem_dense_ab) measured
the vmem kernel at 2609 ms/frame INSIDE a fused frame vs 1.81 ms
isolated per dispatch-equivalent — Pallas calls inside one giant fused
graph appear pathological.  use_fused_frame currently auto-fuses vmem
mode; if fusing regresses on the vmem scene class (cornell_specular,
2188 tris) the gate must drop vmem.

Run once per IMBA_PT_FUSE value (1 / 0): the gate reads env at call
time but the engine caches the frame fn per process.

Appends to results/r4_fused_vmem_ab.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from imbatracer_tpu.frontend.engine import make_frame_fn
from imbatracer_tpu.frontend.renderer import RenderSettings
from imbatracer_tpu.scene.build import build_scene

OUT = "/root/repo/results/r4_fused_vmem_ab.txt"


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    fuse = os.environ.get("IMBA_PT_FUSE", "auto")
    scene, meta = build_scene(
        "/root/reference/test/scenes/cornell/cornell_specular.scene",
        quiet=True)
    size = 1024
    settings = RenderSettings(width=size, height=size, spp=1,
                              algorithm="pt", max_path_len=10)
    frame_fn, _ = make_frame_fn(scene, meta, settings)
    t0 = time.time()
    jax.block_until_ready(frame_fn(jnp.uint32(0)))
    cs = time.time() - t0
    frames = 8
    t0 = time.time()
    out = None
    for i in range(1, frames + 1):
        out = frame_fn(jnp.uint32(i))
    jax.block_until_ready(out)
    ms = (time.time() - t0) / frames * 1e3
    log(f"fuse={fuse:4s} mode={scene.bvh.mode} pt [{size}]: {ms:8.1f} "
        f"ms/frame  (compile {cs:.0f}s, compact="
        f"{os.environ.get('IMBA_PT_COMPACT', 'auto')})")


if __name__ == "__main__":
    main()
