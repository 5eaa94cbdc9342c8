"""Round-4 item 8: dense-regime shootout — the unrolled XLA dense loop
(traverse._dense_loop, the production route for <=1024 tris on TPU) vs
the Pallas VMEM-resident dense kernel (ops/pallas_intersect.py, currently
routed nowhere).  Keep the winner, delete/route the loser.

Isolated traversal dispatch (not a full frame): 262k scattered rays, the
36-tri cornell set and a ~1k-tri procedural set.  NOTE the production
megastep FUSES the XLA dense loop into shading (no dispatch boundary);
the kernel can only win here by enough to cover losing that fusion.

Writes results/r4_dense_pallas.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.ops.pallas_intersect import (closest_hit_pallas,
                                                 make_tris12)
from imbatracer_tpu.render.intersect import BIG
from imbatracer_tpu.render.traverse import _dense_loop
from imbatracer_tpu.scene.procedural import make_big_scene, make_cornell_scene

OUT = "/root/repo/results/r4_dense_pallas.txt"
R = 1 << 18


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def rays(seed, lo, hi):
    rs = np.random.RandomState(seed)
    org = rs.uniform(lo, hi, (R, 3)).astype(np.float32)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def time_it(fn, reps=20):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(1, reps + 1):
        out = fn(i)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    log(f"# dense shootout  backend={jax.default_backend()}  R={R}")
    for name, (scene, _) in (
        ("cornell36", make_cornell_scene()),
        ("big1k", make_big_scene(num_boxes=80, seed=5)),
    ):
        bvh = scene.bvh
        nt = int(bvh.tri_v0.shape[0])
        org, d = rays(7, -1.0, 1.0) if nt < 100 else rays(7, -30.0, 30.0)
        tris12 = make_tris12(bvh)

        @jax.jit
        def xla_fn(i, bvh=bvh, org=org, d=d):
            h = _dense_loop(bvh, org + 0.0 * i, d, 0.0, BIG, None, None,
                            True)
            return h.t * h.t + h.u  # nonlinear consume

        @jax.jit
        def pal_fn(i, tris12=tris12, org=org, d=d):
            h = closest_hit_pallas(tris12, org + 0.0 * i, d, 0.0, BIG)
            return h.t * h.t + h.u

        # agreement check first
        from imbatracer_tpu.render.traverse import _dense_loop as dl
        hx = dl(bvh, org, d, 0.0, BIG, None, None, True)
        hp = closest_hit_pallas(tris12, org, d, 0.0, BIG)
        agree = float(jnp.mean((hx.prim_id == hp.prim_id).astype(
            jnp.float32)))
        tx = time_it(xla_fn)
        tp = time_it(pal_fn)
        log(f"{name} ({nt} tris): xla_unroll {tx:7.2f} ms  "
            f"pallas {tp:7.2f} ms  agree {agree:.4f}  "
            f"({R / tx / 1e3:.1f} vs {R / tp / 1e3:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
