"""Round-4 item 1, step 2: the locality fix A/B.

profile_vcm_lpc confirmed the vcm_perf.md §4 suspect: shrinking the
frame-sized tables 4x (lpc 524288 -> 131072) cut the 1024² frame 42%
(11662 -> 6723 ms) — far more than the light pass's own share.  The
counter is IMBA_VCM_CONNECT_SLICE (vcm._connect): sample connection
vertices from one contiguous-modulo cache window per dispatch, so the
per-lane random gather reads an S-row buffer instead of the 25 MB
cache_rec table.  Estimator-neutral (tests/test_connect_slice.py).

One slice value per process (the knob is read at trace time); the chain
runs SLICE=0 / 32768 / 4096.  BPT isolates connect (no merge); VCM is
the production mix.  Compaction OFF for clean accounting.

Appends to results/r4_slice_ab.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
os.environ["IMBA_VCM_COMPACT"] = "0"
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from imbatracer_tpu.frontend.engine import make_frame_fn
from imbatracer_tpu.frontend.renderer import RenderSettings
from imbatracer_tpu.scene.build import build_scene

OUT = "/root/repo/results/r4_slice_ab.txt"


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    slice_rows = os.environ.get("IMBA_VCM_CONNECT_SLICE", "0")
    take = os.environ.get("IMBA_TAKE", "gather")
    scene, meta = build_scene(
        "/root/reference/test/scenes/cornell/cornell_specular.scene",
        quiet=True)
    size = 1024
    for algo in ("bpt", "vcm"):
        settings = RenderSettings(width=size, height=size, spp=1,
                                  algorithm=algo, max_path_len=10)
        frame_fn, _ = make_frame_fn(scene, meta, settings)
        t0 = time.time()
        film = frame_fn(jnp.uint32(0))
        jax.block_until_ready(film)
        cs = time.time() - t0
        frames = 3
        t0 = time.time()
        for i in range(1, frames + 1):
            film = frame_fn(jnp.uint32(i))
        jax.block_until_ready(film)
        ms = (time.time() - t0) / frames * 1e3
        log(f"slice={slice_rows:>6s} {algo:3s} [{size}]: {ms:8.1f} ms/frame"
            f"  (compile {cs:.0f}s, compact=OFF, take={take})")


if __name__ == "__main__":
    main()
