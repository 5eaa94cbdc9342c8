"""Multi-chip overhead measurement on the 8-virtual-device CPU mesh.

VERDICT r2 item 7: the sharded paths are correctness-proven (bitwise
tests + dryrun); this measures their OVERHEAD — the extra work the
sharded schedule adds over the single-device schedule — and counts the
collectives in the compiled HLO, so the expected v5e-8 scaling can be
projected without 8 real chips (docs/multichip.md holds the analysis).

Method: CPU mesh timings cannot give TPU absolute numbers, but overhead
STRUCTURE is hardware-independent: extra ops (cache merge, canonicalize,
band concat) and collective count/size transfer directly; only the
per-byte collective cost changes (ICI ~100 GB/s/link on v5e vs
memcpy-speed on a CPU host mesh).

Run:  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/profile_multichip.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.parallel.shard import (make_mesh, render_pt_frame_sharded,
                                           render_vcm_frame_sharded)
from imbatracer_tpu.render.camera import make_camera
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.render.integrators.vcm import render_vcm_frame
from imbatracer_tpu.scene.procedural import make_cornell_scene


def timeit(fn, reps=3):
    jax.block_until_ready(fn(0))
    t0 = time.time()
    for i in range(1, reps + 1):
        jax.block_until_ready(fn(i))
    return (time.time() - t0) / reps


def count_collectives(jfn, *args, **kw):
    txt = jax.jit(jfn).lower(*args, **kw).compile().as_text()
    return {op: txt.count(op) for op in
            ("all-reduce", "all-gather", "reduce-scatter",
             "collective-permute")}


def main():
    print(f"devices: {len(jax.devices())} ({jax.default_backend()})",
          flush=True)
    scene, meta = make_cornell_scene()
    mesh = make_mesh(jax.devices()[:8])
    size = 256
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up, size, size,
                      60.0)

    # ---- PT ----------------------------------------------------------
    t1 = timeit(lambda i: render_pt_frame(
        scene, cam, jnp.uint32(i), size, size, max_len=6))
    t8 = timeit(lambda i: render_pt_frame_sharded(
        scene, cam, jnp.uint32(i), size, size, mesh, max_len=6))
    # Perfect scaling on an N-device mesh of 1 real host: t8 == t1
    # (same total flops, split into N programs).  Overhead = extra time.
    print(f"PT {size}²: single {t1*1e3:.0f} ms, sharded(8) {t8*1e3:.0f} ms "
          f"-> overhead {100*(t8/t1-1):+.1f}%", flush=True)

    # ---- VCM ---------------------------------------------------------
    r = jnp.float32(0.05)
    kw = dict(algo="vcm", width=size, height=size, max_len=6,
              light_path_count=size * size // 2,
              cache_capacity=size * size)
    v1 = timeit(lambda i: render_vcm_frame(scene, cam, jnp.uint32(i), r,
                                           **kw), reps=2)
    v8 = timeit(lambda i: render_vcm_frame_sharded(
        scene, cam, jnp.uint32(i), r, mesh, **kw), reps=2)
    print(f"VCM {size}²: single {v1*1e3:.0f} ms, sharded(8) {v8*1e3:.0f} ms "
          f"-> overhead {100*(v8/v1-1):+.1f}%", flush=True)

    # ---- collective counts (static evidence) -------------------------
    from imbatracer_tpu.parallel.shard import _pt_band_sharded
    from functools import partial

    f = partial(_pt_band_sharded, width=size, height=size, spp=1,
                max_len=6, has_masks=False, has_bump=False, mesh=mesh,
                max_steps=0, with_stats=False, band_pixels=size * size // 8)
    txt_counts = count_collectives(f, scene, cam, jnp.uint32(0),
                                   jnp.int32(0))
    print(f"PT band HLO collectives: {txt_counts}", flush=True)


if __name__ == "__main__":
    main()
