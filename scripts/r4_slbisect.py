"""Bisect the still_life VCM-family remote-compile failure (bench_r4.csv:
still_life_bpt_1080p / still_life_ppm_1M / still_life_bpt_512 all die with
`remote_compile HTTP 500: tpu_compile_helper subprocess exit code 1` within
~30-80 s, i.e. the TPU compile helper crashes — size-independent down to
512^2).  The working configs (cornell vcm/bpt, instances_vcm_1080p,
still_life PT at 1080p) differ from the failing ones only in the LIGHT
pass's feature set, so bisect scene features at 256^2 bpt:

  full      - all features (expected FAIL; confirms the repro at 256^2)
  noenv     - no env light (env emission sampling off the light pass)
  nocards   - no alpha-masked foliage cards
  diffuse   - diffuse-only material set (no mirror/glass/glossy/phong/ON)
  bare      - none of the above (expected PASS)

One variant per process (`--variant X`): a crashed compile can poison the
client, and each fresh process recompiles anyway (remote compiles are not
cached).  Appends one line per run to results/r4_slbisect.txt.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
sys.path.insert(0, "/root/repo")

if os.environ.get("JAX_PLATFORM_NAME", "") == "cpu":
    # The axon TPU plugin ignores JAX_PLATFORMS; force before backend init
    # (CLAUDE.md environment gotchas).
    import jax

    jax.config.update("jax_platforms", "cpu")

OUT = "/root/repo/results/r4_slbisect.txt"

VARIANTS = {
    "full": {},
    "noenv": {"with_env": False},
    "nocards": {"num_cards": 0},
    "diffuse": {"specular_share": False},
    "bare": {"with_env": False, "num_cards": 0, "specular_share": False},
}


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True, choices=sorted(VARIANTS))
    ap.add_argument("--algo", default="bpt")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lpc", type=int, default=0,
                    help="light_path_count override (0 = default): separates "
                         "light-pass scale from camera-pass scale")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from imbatracer_tpu.frontend.engine import make_frame_fn
    from imbatracer_tpu.frontend.renderer import RenderSettings
    from imbatracer_tpu.scene.procedural import make_still_life_like

    backend = jax.default_backend()
    scene, meta = make_still_life_like(**VARIANTS[args.variant])
    settings = RenderSettings(width=args.size, height=args.size, spp=1,
                              algorithm=args.algo, max_path_len=8,
                              light_path_count=args.lpc)
    frame_fn, _ = make_frame_fn(scene, meta, settings)
    t0 = time.time()
    try:
        film = frame_fn(jnp.uint32(0))
        jax.block_until_ready(film)
        mean = float(jnp.mean(film))
        lpc = f" lpc={args.lpc}" if args.lpc else ""
        log(f"{args.variant:8s} {args.algo} {args.size}^2{lpc} [{backend}]: "
            f"PASS  compile+frame {time.time() - t0:6.1f}s  "
            f"film_mean {mean:.5f}")
    except Exception as e:
        lpc = f" lpc={args.lpc}" if args.lpc else ""
        log(f"{args.variant:8s} {args.algo} {args.size}^2{lpc} [{backend}]: "
            f"FAIL  after {time.time() - t0:6.1f}s  "
            f"{type(e).__name__}: {str(e)[:160]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
