"""Masked-traversal frame-level cost split on the leaf canopy.

The dispatch-level split (r4_maskedsplit, chain19) showed the khit
re-trace rounds are FREE and the whole masked closest-hit overhead is
the prepass/alpha machinery (+19 ms primary / +15 scattered on a
39/92 ms opaque dispatch = 1.49x/1.16x).  But the frame measures 2.36x
(bench_masked.csv), so the rest must hide in the masked any_hit
(shadow) path — which currently answers a boolean occlusion query by
running the FULL masked closest-hit (traverse.any_hit stream branch).

This probe splits the frame:
  masked_full     : production masked frame
  masked_noshadow : ablate=("shadow",) — NEE shadow any_hit removed
  opaque_full     : alpha ignored
  opaque_noshadow : opaque with shadow removed
masked shadow share = (masked_full - masked_noshadow)
opaque shadow share = (opaque_full - opaque_noshadow)

Plus the isolated alpha_fn gather-chain cost at 1M lanes (it chains
~6 dynamic gathers: 22-col shade record row -> material row -> 3 atlas
geometry rows -> texel).

Appends to results/r4_maskcost.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.frontend.engine import traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators import pt as pt_mod
from imbatracer_tpu.render.integrators.pt import alpha_fn_for
from imbatracer_tpu.scene.procedural import make_leaf_scene

OUT = "/root/repo/results/r4_maskcost.txt"
SIZE = 1024


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def frame_time(scene, cam, max_steps, has_masks, ablate=(), frames=6):
    def frame(i):
        return pt_mod.render_pt_frame(
            scene, cam, jnp.uint32(i), SIZE, SIZE, spp=1, max_len=6,
            has_masks=has_masks, max_steps=max_steps, ablate=ablate)

    film = frame(0)
    jax.block_until_ready(film)
    t0 = time.time()
    for i in range(1, frames + 1):
        film = frame(i)
    jax.block_until_ready(film)
    return (time.time() - t0) / frames * 1e3


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    scene, meta = make_leaf_scene(num_leaves=6000)
    max_steps = traversal_steps(meta)
    settings = RenderSettings(width=SIZE, height=SIZE, spp=1, max_path_len=6)
    cam = camera_for_scene(meta, settings)
    log(f"# maskcost  backend={jax.default_backend()} tris={meta.num_tris} "
        f"mode={scene.bvh.mode} size={SIZE}")

    rows = [
        ("masked_full    ", True, ()),
        ("masked_noshadow", True, ("shadow",)),
        ("opaque_full    ", False, ()),
        ("opaque_noshadow", False, ("shadow",)),
    ]
    res = {}
    for name, masks, abl in rows:
        ms = frame_time(scene, cam, max_steps, masks, abl)
        res[name.strip()] = ms
        log(f"{name}: {ms:8.1f} ms/frame")
    m_sh = res["masked_full"] - res["masked_noshadow"]
    o_sh = res["opaque_full"] - res["opaque_noshadow"]
    m_cl = res["masked_noshadow"] - res["opaque_noshadow"]
    log(f"shadow share: masked {m_sh:.1f} ms vs opaque {o_sh:.1f} ms "
        f"(masked-shadow excess {m_sh - o_sh:+.1f})")
    log(f"closest(+alpha) excess over opaque, shadow removed: {m_cl:+.1f} ms")

    # isolated alpha_fn gather chain, 1M lanes
    alpha_fn = alpha_fn_for(scene)
    n = 1 << 20
    rs = np.random.RandomState(0)
    num_tris = int(meta.num_tris)
    prim = jnp.asarray(rs.randint(0, num_tris, n), jnp.int32)
    u = jnp.asarray(rs.uniform(0, 1, n), jnp.float32)
    v = jnp.asarray(rs.uniform(0, 1, n) * (1.0 - np.asarray(u)), jnp.float32)

    def make(k):
        @jax.jit
        def run(prim, u, v):
            def body(i, acc):
                op = alpha_fn(prim, u + acc * 1e-30, v)
                return acc + jnp.tanh(jnp.sum(op.astype(jnp.float32)) * 1e-9)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return run

    f1, f2 = make(2), make(18)
    jax.block_until_ready(f1(prim, u, v))
    jax.block_until_ready(f2(prim, u, v))
    t0 = time.perf_counter()
    jax.block_until_ready(f1(prim, u, v))
    t1 = time.perf_counter()
    jax.block_until_ready(f2(prim, u, v))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / 16 * 1e3
    log(f"alpha_fn alone, 1M lanes: {per:.2f} ms/call")


if __name__ == "__main__":
    main()
