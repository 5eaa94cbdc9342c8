"""Round-4 bias-vs-tail discriminator for the BPT quality floor.

BPT converges to ~28.8 dB on the cornell_org golden while dedicated PT
reaches 39 dB (results/bench_r3_gate.csv), yet the 384-frame mean films
agree to 0.5% (r4_bpt_bias.txt).  Two hypotheses:

  (a) heavy-tail NOISE: near-field vertex connections (geom ~ 1/d^2,
      unclamped, reference-faithful: vcm.cpp:509-521) produce rare huge
      samples; raw RMSE converges far slower than 1/sqrt(N) but the
      estimator is exact.
  (b) spatial BIAS: some technique/weight deviates; no budget fixes it.

Discriminators measured here, all on the TPU at 256^2:
  1. bpt accumulated in 6 checkpoints of 256 frames: if rmse(bpt_N, pt)
     falls ~1/sqrt(N) -> noise; if it flattens -> bias.
  2. Two independent 768-frame halves A/B: rmse(A,B)/sqrt(2) estimates
     the pure-noise floor at N=768; compare to rmse(mean(A,B), pt).
  3. cornell_indirect bpt 2x384: is the +10% glow excess seed-stable?

Writes results/r4_bias3.txt + films in results/r4_bias/.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.frontend.engine import estimate_pixel_size, traversal_steps
from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
from imbatracer_tpu.render.integrators.pt import render_pt_frame
from imbatracer_tpu.render.integrators.vcm import render_vcm_frame
from imbatracer_tpu.scene.build import build_scene

SIZE = int(os.environ.get("IMBA_BIAS_SIZE", "256"))
FRAME_DIV = int(os.environ.get("IMBA_BIAS_DIV", "1"))   # CPU smoke: 128
OUT = "/root/repo/results/r4_bias3.txt"
DIR = "/root/repo/results/r4_bias"
SEED_B = 1 << 20   # frame offset for the independent half


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def rel_rmse(a, b, trim=0.0):
    d = (a - b).mean(1)
    scale = max(float(a.mean()), 1e-9)
    if trim:
        k = int(len(d) * (1.0 - trim))
        d = d[np.argsort(np.abs(d))[:k]]
    return float(np.sqrt((d ** 2).mean())) / scale


def make_accum(frame_fn, chunk):
    @jax.jit
    def run_chunk(f0):
        def body(k, acc):
            return acc + frame_fn((f0 + k).astype(jnp.uint32))
        return jax.lax.fori_loop(
            0, chunk, body, jnp.zeros((SIZE * SIZE, 3), jnp.float32))
    return run_chunk


def accumulate(frame_fn, frames, chunk=32, offset=0, checkpoints=()):
    """Mean film; optionally yields (n_frames, mean) at checkpoints."""
    chunk = max(1, min(chunk, frames))
    frames = (frames // chunk) * chunk
    run_chunk = make_accum(frame_fn, chunk)
    acc = np.zeros((SIZE * SIZE, 3), np.float64)
    out = []
    t0 = time.time()
    done = 0
    for f0 in range(offset, offset + frames, chunk):
        acc += np.asarray(run_chunk(jnp.uint32(f0)), np.float64)
        done += chunk
        if done in checkpoints:
            out.append((done, acc / done))
    return acc / frames, time.time() - t0, out


def run_scene(scene_path, tag, bpt_frames, checkpoints):
    scene, meta = build_scene(scene_path, quiet=True)
    settings = RenderSettings(width=SIZE, height=SIZE)
    cam = camera_for_scene(meta, settings)
    max_steps = traversal_steps(meta)
    px = estimate_pixel_size(scene, cam, meta)
    base_radius = jnp.float32(px * settings.radius_factor)
    mat_kinds = tuple(sorted(set(
        int(k) for k in np.asarray(scene.materials.kind))))
    log(f"# bias3 {tag}: backend={jax.default_backend()} size={SIZE} "
        f"bpt_frames=2x{bpt_frames}")

    def pt_fn(f):
        return render_pt_frame(scene, cam, f, SIZE, SIZE,
                               max_len=10, max_steps=max_steps)

    def bpt_fn(f):
        return render_vcm_frame(
            scene, cam, f, base_radius, algo="bpt", width=SIZE, height=SIZE,
            spp=1, max_len=10, light_path_count=SIZE * SIZE // 2,
            max_steps=max_steps, mat_kinds=mat_kinds)

    pt, dt, _ = accumulate(pt_fn, max(1024 // FRAME_DIV, 2))
    np.save(f"{DIR}/b3_{tag}_pt.npy", pt.astype(np.float32))
    log(f"rendered pt 1024/{FRAME_DIV} frames in {dt:6.1f}s")

    ck = tuple(max(c // FRAME_DIV, 1) for c in checkpoints)
    a, dt, cks = accumulate(bpt_fn, max(bpt_frames // FRAME_DIV, 2),
                            checkpoints=ck)
    log(f"rendered bpt seedA {max(bpt_frames // FRAME_DIV, 2)} frames "
        f"in {dt:6.1f}s")
    b, dt, _ = accumulate(bpt_fn, max(bpt_frames // FRAME_DIV, 2),
                          offset=SEED_B)
    log(f"rendered bpt seedB {max(bpt_frames // FRAME_DIV, 2)} frames "
        f"in {dt:6.1f}s")
    np.save(f"{DIR}/b3_{tag}_bptA.npy", a.astype(np.float32))
    np.save(f"{DIR}/b3_{tag}_bptB.npy", b.astype(np.float32))

    log("")
    for n, m in cks:
        log(f"  bpt_N={n:5d} vs pt: raw {rel_rmse(pt, m)*100:6.2f}%  "
            f"trim0.1% {rel_rmse(pt, m, 0.001)*100:6.2f}%")
    log(f"  seedA  vs pt   : raw {rel_rmse(pt, a)*100:6.2f}%  "
        f"trim0.1% {rel_rmse(pt, a, 0.001)*100:6.2f}%  "
        f"ratio {float(a.mean()/pt.mean()):.4f}")
    log(f"  seedB  vs pt   : raw {rel_rmse(pt, b)*100:6.2f}%  "
        f"trim0.1% {rel_rmse(pt, b, 0.001)*100:6.2f}%  "
        f"ratio {float(b.mean()/pt.mean()):.4f}")
    log(f"  seedA  vs seedB: raw {rel_rmse(a, b)*100:6.2f}%  "
        f"(pure-noise scale /sqrt2 = {rel_rmse(a, b)*100/1.414:6.2f}%)")
    ab = (a + b) / 2
    log(f"  mean(A,B) vs pt: raw {rel_rmse(pt, ab)*100:6.2f}%  "
        f"trim0.1% {rel_rmse(pt, ab, 0.001)*100:6.2f}%")
    # Seed-stable excess map agreement: corr of (A-pt) vs (B-pt), 8x8.
    k = 8 if SIZE >= 64 else 2
    sm = lambda x: x.reshape(SIZE // k, k, SIZE // k, k, 3).mean((1, 3))
    da = sm((a - pt).reshape(SIZE, SIZE, 3)).ravel()
    db = sm((b - pt).reshape(SIZE, SIZE, 3)).ravel()
    corr = float(np.corrcoef(da, db)[0, 1])
    log(f"  corr[(A-pt),(B-pt)] 8x8-smoothed: {corr:.3f}  "
        f"(~0 -> noise, ~1 -> seed-stable bias)")
    log("")


def main():
    os.makedirs(DIR, exist_ok=True)
    run_scene("/root/reference/test/scenes/cornell/cornell_org.scene",
              "org", 1536, (256, 512, 1024))
    run_scene("/root/reference/test/scenes/cornell/cornell_indirect.scene",
              "ind", 768, (256,))


if __name__ == "__main__":
    main()
