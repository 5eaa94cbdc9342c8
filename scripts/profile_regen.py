"""Why is the regenerated wavefront 6x slower than banded? (TPU)

Isolates the per-step cost of _pt_regen_megastep on cornell 1024²:
  a. banded bounce floor: trace_paths max_len steps / step count
  b. regen megastep, full (flush + reseed)
  c. regen megastep, no film flush         (isolates the scatter-add)
  d. regen megastep, no reseed             (bounce-only floor)
plus scatter-add microbenches: 262k updates into (1M, 3) vs (1M, 8).
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.render.camera import make_camera
from imbatracer_tpu.render.integrators import pt as pt_mod
from imbatracer_tpu.scene.build import build_scene

SCENE = "/root/reference/test/scenes/cornell/cornell_org.scene"


def bench(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    scene, meta = build_scene(SCENE, quiet=True)
    size = 1024
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up,
                      size, size, 60.0)
    num_pixels = size * size
    lanes = 1 << 18
    frame = jnp.uint32(1)

    # ---- scatter microbenches ---------------------------------------
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, num_pixels, lanes), jnp.int32)
    vals3 = jnp.asarray(rs.rand(lanes, 3), jnp.float32)
    vals8 = jnp.asarray(rs.rand(lanes, 8), jnp.float32)
    film3 = jnp.zeros((num_pixels, 3), jnp.float32)
    film8 = jnp.zeros((num_pixels, 8), jnp.float32)
    idx_s = jnp.sort(idx)

    @jax.jit
    def sc3(f, i, v):
        return jnp.sum(jnp.abs(f.at[i].add(v, mode="drop") - 0.1))

    @jax.jit
    def sc8(f, i, v):
        return jnp.sum(jnp.abs(f.at[i].add(v, mode="drop") - 0.1))

    bench("scatter-add 262k -> (1M,3) random", sc3, film3, idx, vals3)
    bench("scatter-add 262k -> (1M,3) sorted", sc3, film3, idx_s, vals3)
    bench("scatter-add 262k -> (1M,8) random", sc8, film8, idx, vals8)

    @jax.jit
    def cs(m):
        return jnp.sum(jnp.cumsum(m) * 1e-9)

    bench("cumsum 262k", cs, (idx > 0).astype(jnp.int32))

    # ---- banded bounce floor ----------------------------------------
    def banded(i):
        return pt_mod.render_pt_frame(scene, cam, jnp.uint32(i), size, size,
                                      max_len=10, with_stats=True)[0]

    dt_band = bench("banded frame (40 band-bounces)", banded, 7)
    print(f"  -> {dt_band*1e3/40:.2f} ms per full-lane bounce", flush=True)

    # ---- regen step variants ----------------------------------------
    T = num_pixels
    z1 = jnp.zeros((lanes,), jnp.float32)
    z3 = jnp.zeros((lanes, 3), jnp.float32)
    c0 = dict(
        org=z3, d=z3.at[:, 2].set(1.0), tmin=z1, throughput=z3,
        radiance=z3, active=jnp.zeros((lanes,), bool),
        depth=jnp.zeros((lanes,), jnp.int32), last_pdf=z1,
        last_specular=jnp.zeros((lanes,), bool),
        state=jnp.zeros((lanes,), jnp.uint32) + 1,
        n_rays=jnp.zeros((), jnp.int32),
        film=jnp.zeros((num_pixels, 3), jnp.float32),
        lane_pixel=jnp.full((lanes,), -1, jnp.int32),
        next_id=jnp.zeros((), jnp.int32),
    )
    kw = dict(width=size, height=size, spp=1, max_len=10, has_masks=False,
              has_bump=False, max_steps=0, num_paths=T)

    for tag, opts in (("regen 16 steps FULL", {}),
                      ("regen 16 steps no-flush", {"flush": False}),
                      ("regen 16 steps no-reseed", {"reseed": False})):
        def run(c0=c0, opts=opts):
            out = pt_mod._pt_regen_megastep(scene, cam, frame, c0,
                                            steps=16, **kw, **opts)
            return out["film"]

        dt = bench(tag, run)
        print(f"  -> {dt*1e3/16:.2f} ms/step", flush=True)

    # ---- end-to-end regen frame -------------------------------------
    def regen(i):
        return pt_mod.render_pt_frame_regen(
            scene, cam, jnp.uint32(i), size, size, max_len=10,
            with_stats=True)[0]

    bench("regen full frame", regen, 7)


if __name__ == "__main__":
    main()
