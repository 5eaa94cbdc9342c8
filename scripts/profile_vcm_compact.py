"""VCM camera-pass compaction A/B at 512^2 and 1024^2 (cornell_specular,
kernel merge route) — the round-3 frame-time lever after the merge
kernel (docs/vcm_perf.md)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from imbatracer_tpu.frontend.engine import make_frame_fn
from imbatracer_tpu.frontend.renderer import RenderSettings
from imbatracer_tpu.scene.build import build_scene


def run(scene, meta, size, frames=3):
    settings = RenderSettings(width=size, height=size, spp=1,
                              algorithm="vcm", max_path_len=10)
    frame_fn, _ = make_frame_fn(scene, meta, settings)

    def frame(i):
        return frame_fn(jnp.uint32(i))

    t0 = time.time()
    film = frame(0)
    jax.block_until_ready(film)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(1, frames + 1):
        film = frame(i)
    jax.block_until_ready(film)
    return (time.time() - t0) / frames * 1e3, compile_s


def main():
    scene, meta = build_scene(
        "/root/reference/test/scenes/cornell/cornell_specular.scene")
    print("backend", jax.default_backend(), "mode", scene.bvh.mode)
    # 512^2 @ spp=1 fits one 2^18 band -> _use_compact is a no-op there;
    # only 1024^2 (4 bands) exercises the compaction economics.
    for size in (1024,):
        os.environ["IMBA_VCM_COMPACT"] = "0"
        ms0, c0 = run(scene, meta, size)
        line = f"[{size}] banded : {ms0:8.1f} ms/frame (compile {c0:.0f}s)"
        print(line, flush=True)
        # Measured 2026-08-17: banded 11622 / d=2 11643 / d=3 10418 /
        # d=4 9705 ms.  Sweep continues past the first minimum hunt.
        os.environ["IMBA_VCM_COMPACT"] = "1"
        for d in (4, 5, 6, 7):
            os.environ["IMBA_VCM_COMPACT_DEPTH"] = str(d)
            ms1, c1 = run(scene, meta, size)
            print(f"[{size}] compact d={d}: {ms1:8.1f} ms/frame "
                  f"(compile {c1:.0f}s)", flush=True)
    os.environ["IMBA_VCM_COMPACT"] = "0"


if __name__ == "__main__":
    main()
