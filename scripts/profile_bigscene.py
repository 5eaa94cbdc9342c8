"""Large-scene traversal throughput with the fused single-gather loop."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.scene.procedural import make_big_scene
from imbatracer_tpu.frontend.engine import make_frame_fn, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings
from imbatracer_tpu.render.camera import make_camera, generate_ray
from imbatracer_tpu.render.traverse import closest_hit
from imbatracer_tpu.render.intersect import BIG


def main():
    scene, meta = make_big_scene(num_boxes=4000)
    print("tris:", meta.num_tris, "bvh:", meta.bvh_stats,
          "steps:", traversal_steps(meta))

    R = 1 << 20
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up, 1024, 1024, 60.0)
    ids = jnp.arange(R, dtype=jnp.int32)
    px = (ids % 1024).astype(jnp.float32)
    py = (ids // 1024).astype(jnp.float32)
    org, d = generate_ray(cam, px, py)
    steps = traversal_steps(meta)

    f = jax.jit(lambda o, dd, s: closest_hit(
        scene.bvh, o, dd, 0.0, BIG, max_steps=steps).t.sum() + s)
    f(org, d, 0.0).block_until_ready()
    t0 = time.time()
    for i in range(5):
        out = f(org, d, float(i))
    out.block_until_ready()
    dt = (time.time() - t0) / 5
    print(f"closest_hit 1M {meta.num_tris} tris: {dt*1000:.1f} ms "
          f"-> {R/dt/1e6:.1f} Mrays/s  ({steps} steps)")

    # Full PT frame.
    settings = RenderSettings(width=1024, height=1024, max_path_len=6, algorithm="pt")
    frame_fn, _ = make_frame_fn(scene, meta, settings)
    film = frame_fn(jnp.uint32(0))
    jax.block_until_ready(film)
    t0 = time.time()
    for i in range(1, 4):
        film = frame_fn(jnp.uint32(i))
    jax.block_until_ready(film)
    dt = (time.time() - t0) / 3
    print(f"PT frame 1024^2 len6: {dt*1000:.0f} ms")
    img = np.asarray(film).reshape(1024, 1024, 3)
    print("mean", img.mean(), "finite", np.isfinite(img).all())
    from imbatracer_tpu.io.image import store_png
    store_png("/tmp/bigscene.png", img, weight=1.0, gamma=0.5)


if __name__ == "__main__":
    main()
