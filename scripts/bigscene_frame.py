"""End-to-end PT frame timing on a big procedural scene via the engine
(stream traversal mode).  Usage: python scripts/bigscene_frame.py [boxes]
[size]."""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.frontend.engine import make_frame_fn
from imbatracer_tpu.frontend.renderer import RenderSettings
from imbatracer_tpu.scene.procedural import make_big_scene

boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

scene, meta = make_big_scene(boxes)
print("tris:", meta.num_tris, "mode:", scene.bvh.mode)
settings = RenderSettings(width=size, height=size, spp=1, algorithm="pt",
                          max_path_len=6)
frame_fn, cam = make_frame_fn(scene, meta, settings)

t0 = time.time()
f0 = np.asarray(frame_fn(jnp.uint32(0)))
print(f"first frame (compile): {time.time()-t0:.1f}s  mean={f0.mean():.4f}")
t0 = time.time()
N = 4
for f in range(1, 1 + N):
    out = np.asarray(frame_fn(jnp.uint32(f)))
dt = (time.time() - t0) / N
rays = size * size * 6 * 2  # upper bound: max_len bounces x (closest+shadow)
print(f"per frame: {dt*1000:.0f} ms  ({size}x{size}, <= {rays/dt/1e6:.0f} Mrays/s bound)")
print("nonzero:", float((out > 0).mean()))
