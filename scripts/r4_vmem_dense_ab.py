"""Round-4: end-to-end dense-vs-vmem A/B on the headline workload.

probe_dense_pallas measured the VMEM Pallas kernel 1.42x faster than the
unrolled XLA dense form on an ISOLATED cornell-scale dispatch (144.7 vs
101.6 Mrays/s).  Production fuses the dense form into shading, so the
isolated win may not survive — this renders the real fused PT frame
(cornell_org 1024², one-dispatch frames) with the BVH uploaded in each
mode and reports Mrays/s.  Decides the bottom end of choose_mode.

Writes results/r4_vmem_dense.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.accel.builder import build_bvh
from imbatracer_tpu.accel.device import DeviceBvh
from imbatracer_tpu.accel.flatten import thread_bvh
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.scene.build import build_scene

OUT = "/root/repo/results/r4_vmem_dense.txt"
SIZE = 1024


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    scene, meta = build_scene(
        "/root/reference/test/scenes/cornell/cornell_org.scene", quiet=True)
    settings = RenderSettings(width=SIZE, height=SIZE)
    cam = camera_for_scene(meta, settings)
    log(f"# dense-vs-vmem fused frame  backend={jax.default_backend()} "
        f"tris={meta.num_tris}")

    # Reconstruct the host ThreadedBvh from the device-packed triangles
    # (original flat order via tri_id so shade_rec gathers stay valid).
    pid = np.asarray(scene.bvh.tri_id)
    pv0 = np.asarray(scene.bvh.tri_v0)
    pe1 = np.asarray(scene.bvh.tri_e1)
    pe2 = np.asarray(scene.bvh.tri_e2)
    keep = pid >= 0
    ntri = int(pid[keep].max()) + 1
    v0 = np.zeros((ntri, 3), np.float32)
    v1 = np.zeros((ntri, 3), np.float32)
    v2 = np.zeros((ntri, 3), np.float32)
    v0[pid[keep]] = pv0[keep]
    v1[pid[keep]] = pv0[keep] + pe1[keep]
    v2[pid[keep]] = pv0[keep] + pe2[keep]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    host_bvh = thread_bvh(build_bvh(lo, hi), v0, v1, v2)

    for mode in ("dense", "vmem"):
        bvh = DeviceBvh.from_threaded(host_bvh, mode=mode)
        sc = scene.replace(bvh=bvh)

        @jax.jit
        def frame(i, sc=sc):
            return render_pt_frame(sc, cam, i, SIZE, SIZE,
                                   max_len=settings.max_path_len,
                                   with_stats=True)

        film, n = frame(jnp.uint32(0))
        jax.block_until_ready(film)
        n_rays = int(n)
        reps = 20
        t0 = time.time()
        for i in range(1, reps + 1):
            film, n = frame(jnp.uint32(i))
        jax.block_until_ready(film)
        ms = (time.time() - t0) / reps * 1e3
        log(f"{mode:6s}: {ms:7.1f} ms/frame  "
            f"({n_rays / (ms / 1e3) / 1e6:.1f} Mrays/s, rays={n_rays})")


if __name__ == "__main__":
    main()
