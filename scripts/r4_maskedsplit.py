"""Masked-traversal cost split on the leaf canopy (dispatch level).

The full-frame bench (bench_masked.csv) says masked = 2.36x opaque with
the single-hit prepass on; this isolates WHERE the 1.36x extra goes per
closest-hit dispatch:

  opaque      : closest_hit, no alpha_fn (the baseline the 2x bar is on)
  prepass_only: masked path with IMBA_MASK_MAX_ROUNDS=0 (prepass
                dispatch + alpha machinery, khit loop compiled to a
                zero-trip while; IMAGE WRONG, timing only)
  masked_full : the production exact path (prepass + khit rounds)

Both primary-coherent and hemisphere-scattered batches, 262k rays.
Trip-count telemetry: the mean khit rounds actually taken (host loop
re-running with capped rounds would change timing; instead we count
via the unresolved fraction after the prepass).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import imbatracer_tpu.render.traverse as tv
from imbatracer_tpu.render.integrators.pt import alpha_fn_for
from imbatracer_tpu.scene.procedural import make_leaf_scene


def slope(fn, org, d, iters=12):
    def make(k):
        @jax.jit
        def run(org, d):
            def body(i, acc):
                h = fn(org + acc * 1e-30, d)
                return acc + jnp.tanh(jnp.sum(h.t * 1e-9))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return run

    f1, f2 = make(2), make(2 + iters)
    jax.block_until_ready(f1(org, d)); jax.block_until_ready(f2(org, d))
    t0 = time.perf_counter(); jax.block_until_ready(f1(org, d))
    t1 = time.perf_counter(); jax.block_until_ready(f2(org, d))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters * 1e3


def main():
    scene, meta = make_leaf_scene()
    print("tris:", meta.num_tris, "mode:", scene.bvh.mode,
          "backend:", jax.default_backend(), flush=True)
    alpha_fn = alpha_fn_for(scene)
    bvh = scene.bvh
    n = 1 << 18
    rs = np.random.RandomState(3)

    v0 = np.asarray(bvh.tri_v0)
    valid = np.asarray(bvh.tri_id) >= 0
    pts = np.concatenate([v0[valid],
                          v0[valid] + np.asarray(bvh.tri_e1)[valid],
                          v0[valid] + np.asarray(bvh.tri_e2)[valid]])
    lo, hi = pts.min(0), pts.max(0)
    ctr = (lo + hi) / 2

    # primary-like: one eye point, frustum into the canopy
    side = int(np.sqrt(n))
    i = np.arange(n)
    xs = (i % side) / side - 0.5
    ys = (i // side) / side - 0.5
    d_p = np.stack([xs * 1.2, ys * 0.8 - 0.1, -np.ones(n)], -1)
    d_p /= np.linalg.norm(d_p, axis=-1, keepdims=True)
    org_p = np.broadcast_to(
        np.asarray([ctr[0], ctr[1] + 1.0, hi[2] + 8.0], np.float32),
        (n, 3)).copy()

    # scattered: uniform origins in the canopy bbox, random dirs
    org_s = np.stack([rs.uniform(lo[k], hi[k], n) for k in range(3)],
                     -1).astype(np.float32)
    d_s = rs.randn(n, 3).astype(np.float32)
    d_s /= np.linalg.norm(d_s, axis=-1, keepdims=True)

    for lbl, org, d in (("primary  ", org_p, d_p),
                        ("scattered", org_s, d_s)):
        orgj, dj = jnp.asarray(org), jnp.asarray(d)

        def opaque(o, dd):
            return tv.closest_hit(bvh, o, dd, 0.0, tv.BIG, sort=True)

        def masked(o, dd):
            return tv.closest_hit(bvh, o, dd, 0.0, tv.BIG,
                                  alpha_fn=alpha_fn, sort=True)

        ms_o = slope(opaque, orgj, dj)
        tv.MASK_MAX_ROUNDS = 0
        ms_p = slope(masked, orgj, dj)
        tv.MASK_MAX_ROUNDS = 4096
        ms_m = slope(masked, orgj, dj)

        # unresolved fraction after the prepass = lanes whose first hit
        # alpha-tested transparent (they enter the khit loop)
        h = jax.jit(opaque)(orgj, dj)
        got = np.asarray(h.prim_id) >= 0
        op = np.asarray(jax.jit(alpha_fn)(
            jnp.maximum(h.prim_id, 0), h.u, h.v))
        frac = float((got & ~op).sum()) / n
        print(f"{lbl}: opaque {ms_o:7.2f} ms  prepass_only {ms_p:7.2f}"
              f"  masked_full {ms_m:7.2f} ms"
              f"  (khit share {ms_m - ms_p:6.2f}, alpha+prepass share "
              f"{ms_p - ms_o:6.2f}; unresolved after prepass "
              f"{100 * frac:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
