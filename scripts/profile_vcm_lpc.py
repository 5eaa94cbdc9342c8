"""Round-4 item 1, step 1: the decisive one-knob VCM experiment named in
docs/vcm_perf.md §4 — render cornell_specular 1024^2 with
--light-path-count 131072 (the 512^2 default) vs the 1024^2 default
524288, compaction OFF for clean dispatch-unit accounting.

Interpretation (vcm_perf.md §4): at 1024^2/lpc=524288 the camera pass
costs ~57 ms per 262k-ray dispatch-unit vs ~28 ms at 512^2.  Everything
frame-sized the per-band dispatch touches scales with lpc (vertex-cache
tables read by connect, the merge grid, cache scatter).  If the small-lpc
frame's per-unit cost returns to ~28 ms -> the cost is cache-table
locality -> fix = shard/compact those tables.  If not -> per-bounce
shading fusion is the lever.

Writes results incrementally to results/r4_vcm_lpc.txt.
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

OUT = "/root/repo/results/r4_vcm_lpc.txt"


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def run(scene, meta, size, lpc, frames=3):
    settings = RenderSettings(width=size, height=size, spp=1,
                              algorithm="vcm", max_path_len=10,
                              light_path_count=lpc)
    frame_fn, _ = make_frame_fn(scene, meta, settings)
    t0 = time.time()
    film = frame_fn(jnp.uint32(0))
    jax.block_until_ready(film)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(1, frames + 1):
        film = frame_fn(jnp.uint32(i))
    jax.block_until_ready(film)
    return (time.time() - t0) / frames * 1e3, compile_s


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    scene, meta = build_scene(
        "/root/reference/test/scenes/cornell/cornell_specular.scene")
    log(f"# vcm lpc experiment  backend={jax.default_backend()} "
        f"mode={scene.bvh.mode} compact=OFF")
    size = 1024
    for lpc in (524288, 131072):
        ms, cs = run(scene, meta, size, lpc)
        # Dispatch units: light pass bands x 10 bounces (fractional for
        # sub-band lpc) + camera 4 bands x 10 bounces.
        light_units = lpc / (1 << 18) * 10
        cam_units = 4 * 10
        per_unit = ms / (light_units + cam_units)
        log(f"[{size}] lpc={lpc:7d}: {ms:8.1f} ms/frame  "
            f"(~{per_unit:5.1f} ms per 262k-ray unit; compile {cs:.0f}s)")


if __name__ == "__main__":
    main()
