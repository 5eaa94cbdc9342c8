"""Microbenchmarks isolating the PT megastep's cost centres on TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.scene.procedural import make_cornell_scene
from imbatracer_tpu.render.camera import make_camera
from imbatracer_tpu.render.integrators.pt import camera_rays, render_pt_frame
from imbatracer_tpu.render.traverse import any_hit, closest_hit
from imbatracer_tpu.render.intersect import BIG


def bench(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:36s} {dt*1000:9.2f} ms")
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices())
    scene, meta = make_cornell_scene()
    R = 1 << 20
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up, 1024, 1024, 60.0)
    org, d, state, pixel_id = jax.jit(
        lambda f: camera_rays(cam, 1024, 1024, 1, f)
    )(jnp.uint32(0))
    jax.block_until_ready(org)
    print(f"rays: {R}")

    dt = bench("closest_hit 1M (cornell)", closest_hit, scene.bvh, org, d, 0.0, BIG)
    print(f"  -> {R/dt/1e6:.1f} Mrays/s")
    dt = bench("any_hit 1M", any_hit, scene.bvh, org, d, 0.0, jnp.float32(3.0))
    print(f"  -> {R/dt/1e6:.1f} Mrays/s")

    # Elementwise chain for calibration.
    f_ew = jax.jit(lambda x: jnp.sin(x * 1.1 + 0.3) * jnp.cos(x) + x * x)
    x = jnp.arange(R, dtype=jnp.float32)
    bench("elementwise chain (R,)", f_ew, x)

    # Gather calibration: (N,3) rows vs flat 1D.
    tab3 = jnp.asarray(np.random.rand(100000, 3), jnp.float32)
    tab1 = tab3[:, 0].copy()
    idx = jnp.asarray(np.random.randint(0, 100000, R), jnp.int32)
    f_g3 = jax.jit(lambda t, i: t[i].sum())
    f_g1 = jax.jit(lambda t, i: t[i].sum())
    bench("gather (N,3) rows, R idx", f_g3, tab3, idx)
    bench("gather (N,) flat, R idx", f_g1, tab1, idx)

    # segment_sum calibration.
    from imbatracer_tpu.render.film import splat
    contrib = jnp.ones((R, 3), jnp.float32)
    f_sp = jax.jit(lambda c, p: splat(c, p, 1024 * 1024))
    bench("segment_sum splat 1M->1M", f_sp, contrib, pixel_id)

    # Full megastep.
    f_frame = lambda fr: render_pt_frame(
        scene, cam, fr, 1024, 1024, spp=1, max_len=10
    )
    dt = bench("render_pt_frame 1024^2 len10", f_frame, jnp.uint32(1), n=3)


if __name__ == "__main__":
    main()
