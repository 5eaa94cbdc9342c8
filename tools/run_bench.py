#!/usr/bin/env python
"""Benchmark + regression driver.

Port of the reference harness semantics (reference: test/run_bench.py):
runs renders headless with a time budget, parses the perf line
(`Done after X seconds, N samples @ F frames per second, M ms per frame`,
run_bench.py:207 / render_window.cpp:84-88), computes RMSE against the
golden reference images (ImageMagick-compatible 8-bit RMSE,
run_bench.py:113-129) and writes a CSV:
  name, algorithm, time, samples, fps, ms/frame, RMSE, PSNR, rays/sec

Runs in-process (no subprocess) so it works identically on CPU and TPU.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honour a CPU request before any backend initialises: the axon TPU
# plugin ignores JAX_PLATFORMS (plural); the working knobs are
# JAX_PLATFORM_NAME + the config update (see tests/conftest.py).
if "cpu" in (os.environ.get("JAX_PLATFORMS", "")
             + os.environ.get("JAX_PLATFORM_NAME", "")):
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

SCENES = "/root/reference/test/scenes"
REFS = "/root/reference/test/references"

# (name, scene file, golden image, algorithm, width, height, extra settings)
# NOTE: the reference checkout ships OBJ assets only for the cornell family
# (sponza_scaled.obj / still_life.obj are download-on-demand and absent), so
# the runnable golden set is cornell; large-scene perf uses the procedural
# generator (scene/procedural.py::make_big_scene).
DEFAULT_RUNS = [
    ("cornell_pt", f"{SCENES}/cornell/cornell_org.scene",
     f"{REFS}/ref_cornell_org.png", "pt", 1024, 1024, {}),
    ("cornell_bpt", f"{SCENES}/cornell/cornell_indirect.scene",
     f"{REFS}/ref_cornell_indirect.png", "bpt", 1024, 1024, {}),
    # The indirect golden embeds the reference light pass's extra
    # lamp-rebounce transport (+14% linear vs consistent transport —
    # vcm.py module docstring, results/r4_bias5.txt), so the row above
    # ceilings near ~32 dB for ANY consistent estimator.  This row gates
    # bpt against the PT-rendered org golden, which both sides'
    # dedicated path tracers agree on.
    ("cornell_bpt_org", f"{SCENES}/cornell/cornell_org.scene",
     f"{REFS}/ref_cornell_org.png", "bpt", 1024, 1024, {}),
    # radius_factor 2.0 = the reference BENCH setting (cmd_line.h:70
    # default, no -r in test/run_bench.py's arg sweep).  The 0.003 these
    # rows used through round 3 came from render_refs.sh, which renders
    # the GOLDENS with a near-zero merge radius to keep them unbiased —
    # benching with it cripples vertex merging (the gather radius misses
    # every photon) and was the VCM-family quality wall (r4_pt_goldens:
    # even PT floors at 20-21 dB on these caustic scenes at bench
    # budgets; VCM needs its merge technique to converge them).
    ("cornell_vcm", f"{SCENES}/cornell/cornell_specular.scene",
     f"{REFS}/ref_cornell_specular.png", "vcm", 1024, 1024,
     {"radius_factor": 2.0}),
    ("cornell_vcm_front", f"{SCENES}/cornell/cornell_specular_front.scene",
     f"{REFS}/ref_cornell_specular_front.png", "vcm", 1024, 1024,
     {"radius_factor": 2.0}),
    ("cornell_water_vcm", f"{SCENES}/cornell/cornell_water.scene",
     f"{REFS}/ref_cornell_water.png", "vcm", 1024, 1024,
     {"radius_factor": 2.0}),
    ("cornell_instances_pt", f"{SCENES}/cornell/cornell_instances.scene",
     "", "pt", 1024, 1024, {}),
    # Short-budget-tuned VCM rows: with ~10 frames in a 30 s budget the
    # reference's radius_factor 2.0 (tuned for its ~100-iteration GPU
    # budgets) is noise-dominated; the progressive schedule (alpha=0.75,
    # vcm.py::_mis_constants) keeps any initial radius consistent, and
    # the measured 30 s quality curve is flat in cost and rising to a
    # knee near 8-16 (r4_radius_sweep.csv 23.1/25.6/27.6 dB at 1/2/4;
    # r5_radius_sweep2.csv 28.9 at 8, 29.5 at 16).  Parity rows above
    # stay at 2.0; these record the tuned-default story.
    ("cornell_vcm_r8", f"{SCENES}/cornell/cornell_specular.scene",
     f"{REFS}/ref_cornell_specular.png", "vcm", 1024, 1024,
     {"radius_factor": 8.0}),
    ("cornell_water_vcm_r8", f"{SCENES}/cornell/cornell_water.scene",
     f"{REFS}/ref_cornell_water.png", "vcm", 1024, 1024,
     {"radius_factor": 8.0}),
    # The measured knee of the 30 s curve (r5_radius_sweep2: 29.35 dB at
    # 12, 29.47 at 16 — both beat r8's 28.93 at flat cost); the best
    # short-budget candidate once the frame-speed levers land.
    ("cornell_vcm_r16", f"{SCENES}/cornell/cornell_specular.scene",
     f"{REFS}/ref_cornell_specular.png", "vcm", 1024, 1024,
     {"radius_factor": 16.0}),
    # Radius re-tune candidate once the round-5 frame-speed levers land:
    # the 30 s radius knee was measured at ~3.2 s/frame (r5_radius_sweep2:
    # 12 -> 29.35 dB, 16 -> 29.47); faster frames shift the
    # variance/bias balance toward smaller radii.
    ("cornell_vcm_r12", f"{SCENES}/cornell/cornell_specular.scene",
     f"{REFS}/ref_cornell_specular.png", "vcm", 1024, 1024,
     {"radius_factor": 12.0}),
]

# BASELINE.json config-1..5 proxies (the Still Life OBJ is absent from
# the checkout; proc:still_life is the full-material-set + env + masks
# stand-in, scene/procedural.py::make_still_life_like).  Not in the
# default set — enable with --proxies or --only.
# Goldens are SELF-RENDERED long PT runs (tools/render_golden.py, the
# reference's own render_refs.sh method) keyed by (scene, res,
# max_path_len); rows report RMSE/PSNR once goldens/ is populated and
# silently skip the metric when a golden is absent (run_one).
GOLDENS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "goldens")
PROXY_RUNS = [
    # config 1: CPU-reference parity run — 512^2, 4 bounces, 16 spp
    ("still_life_pt_512_16spp", "proc:still_life",
     f"{GOLDENS}/still_life_512_len4.png", "pt", 512, 512,
     {"max_path_len": 4, "spp": 16}),
    # config 2: full material set + env light, 1080p PT, 8 bounces
    ("still_life_pt_1080p", "proc:still_life",
     f"{GOLDENS}/still_life_1080p_len8.png", "pt", 1920, 1080,
     {"max_path_len": 8}),
    # config 3: BDPT full connections + MIS, 1080p progressive
    ("still_life_bpt_1080p", "proc:still_life",
     f"{GOLDENS}/still_life_1080p_len8.png", "bpt", 1920, 1080,
     {"max_path_len": 8}),
    # config 4: PPM + photon hash grid, 1M photons/iter
    ("still_life_ppm_1M", "proc:still_life",
     f"{GOLDENS}/still_life_1080p_len10.png", "ppm", 1920, 1080,
     {"light_path_count": 1 << 20}),
    # config 5: VCM on an instanced multi-mesh scene, 1080p
    ("instances_vcm_1080p", f"{SCENES}/cornell/cornell_instances.scene",
     f"{GOLDENS}/instances_1080p_len10.png", "vcm", 1920, 1080, {}),
    # Diagnostics for the bench_r4.csv remote-compile failures on the
    # two rows above (HTTP 500 from tpu_compile_helper within ~30 s):
    # scale bisect (512^2 bpt) and photon-count bisect (1080p ppm at
    # the capped default lpc instead of the config-4 1M).
    ("still_life_bpt_512", "proc:still_life",
     f"{GOLDENS}/still_life_512_len10.png", "bpt", 512, 512, {}),
    ("still_life_ppm_131k", "proc:still_life",
     f"{GOLDENS}/still_life_1080p_len10.png", "ppm", 1920, 1080,
     {"light_path_count": 1 << 17}),
]

PROC_SCENES = {
    "proc:still_life": ("make_still_life_like", {}),
    "proc:big": ("make_big_scene", {}),
    "proc:big264": ("make_big_scene", {"num_boxes": 22000}),
    "proc:leaves": ("make_leaf_scene", {}),
}


def _build_any_scene(scene_path):
    """build_scene for .scene files; procedural generators for proc: URIs."""
    if scene_path.startswith("proc:"):
        from imbatracer_tpu.scene import procedural

        fn_name, kw = PROC_SCENES[scene_path]
        return getattr(procedural, fn_name)(**kw)
    from imbatracer_tpu.scene.build import build_scene

    return build_scene(scene_path)


def run_one(name, scene_path, golden, algo, width, height, extra, seconds,
            converge_rmse=0.0, curve_path="", curve_every=5.0):
    """One benchmark run.

    Plain mode: render for `seconds`, report final RMSE/PSNR.
    Convergence-gate mode (reference: test/run_bench.py:254-296): when
    `converge_rmse > 0` and a golden exists, the run PASSES iff RMSE
    drops to the target within the budget; the RMSE-over-time curve
    (reference :231-245 writes intermediate images; we record the metric
    directly) lands in `curve_path` as (time, frames, rmse, psnr) rows.
    """
    import jax
    import numpy as np

    from imbatracer_tpu.frontend.engine import make_frame_fn
    from imbatracer_tpu.frontend.renderer import ProgressiveRenderer, RenderSettings
    from imbatracer_tpu.utils.metrics import load_reference_png, psnr, rmse

    scene, meta = _build_any_scene(scene_path)
    settings = RenderSettings(
        width=width, height=height, algorithm=algo, max_time_sec=seconds,
        **extra,
    )
    frame_fn, _ = make_frame_fn(scene, meta, settings)
    r = ProgressiveRenderer(frame_fn, settings)
    # Compile outside the timed budget, like the reference excludes startup.
    r.step()
    jax.block_until_ready(r.accum)
    # Also warm the tonemap jit image() uses: its first call is a fresh
    # remote compile (~30-75 s through the tunnel) that otherwise lands
    # inside the timed region — run()'s trailing image(), or the first
    # curve sample in converge mode (measured: cornell_vcm 30 s budget
    # reported as 111 s elapsed, r4_chain8.log).
    r.image()
    r.reset()

    ref = None
    if golden and os.path.exists(golden):
        ref = load_reference_png(golden)
        if ref.shape[0] * ref.shape[1] != width * height:
            ref = None

    curve = []
    converged_at = ""
    t0 = time.time()
    if (converge_rmse > 0 or curve_path) and ref is not None:
        next_sample = 0.0
        prev = None
        while time.time() - t0 < seconds:
            r.step()
            # Depth-2 pipeline (same as ProgressiveRenderer.run): block
            # on the previous frame so the tunnel round trip overlaps
            # device work; r.image() below drains the in-flight frame
            # when a curve sample is due.
            if prev is not None:
                jax.block_until_ready(prev)
            prev = r.accum
            el = time.time() - t0
            if el >= next_sample:
                next_sample = el + curve_every
                e = rmse(r.image(), ref)
                curve.append((round(el, 2), r.frames, round(e, 5),
                              round(psnr(r.image(), ref), 2)))
                if converge_rmse > 0 and e <= converge_rmse:
                    converged_at = round(el, 2)
                    break
    else:
        r.run(quiet=True)
    elapsed = time.time() - t0
    img = r.image()

    if curve_path and curve:
        os.makedirs(os.path.dirname(curve_path) or ".", exist_ok=True)
        with open(curve_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["time", "frames", "rmse", "psnr"])
            w.writerows(curve)

    row = {
        "name": name,
        "algorithm": algo,
        "time": round(elapsed, 2),
        "samples": r.frames * settings.spp,
        "fps": round(r.frames / elapsed, 3),
        "ms_per_frame": round(1000 * elapsed / max(r.frames, 1), 2),
        "rmse": "",
        "psnr": "",
    }
    if ref is not None:
        row["rmse"] = round(rmse(img, ref), 5)
        row["psnr"] = round(psnr(img, ref), 2)
    if converge_rmse > 0:
        row["converged_at"] = converged_at
        # No golden -> nothing to converge against: mark SKIP, not FAIL
        # (cornell_instances has no reference image).
        if ref is None:
            row["gate"] = "SKIP"
        else:
            row["gate"] = "PASS" if converged_at != "" else "FAIL"
    return row


def run_instances_selfcheck(seconds=30.0, size=512):
    """Golden-free image check for two-level instancing: render
    cornell_instances through the instanced route (stream2) AND through
    forced flattening, same frame count + RNG, and report their PSNR.
    (VERDICT round-2 item 6c: instancing correctness at image level —
    tests/test_instancing.py proves hit identity; this proves it end to
    end through shading.)"""
    import jax
    import numpy as np

    from imbatracer_tpu.frontend.engine import make_frame_fn
    from imbatracer_tpu.frontend.renderer import (ProgressiveRenderer,
                                                  RenderSettings)
    from imbatracer_tpu.scene.build import build_scene
    from imbatracer_tpu.utils.metrics import psnr

    imgs = []
    frames = 0
    for force_flatten in (False, True):
        scene, meta = build_scene(
            f"{SCENES}/cornell/cornell_instances.scene",
            force_flatten=force_flatten)
        settings = RenderSettings(width=size, height=size, algorithm="pt")
        frame_fn, _ = make_frame_fn(scene, meta, settings)
        r = ProgressiveRenderer(frame_fn, settings)
        r.step()
        jax.block_until_ready(r.accum)
        t0 = time.time()
        if not imgs:
            while time.time() - t0 < seconds:
                r.step()
                jax.block_until_ready(r.accum)
            frames = r.frames
        else:
            while r.frames < frames:
                r.step()
            jax.block_until_ready(r.accum)
        imgs.append(np.asarray(r.image()))
    p = psnr(imgs[0], imgs[1])
    return {"name": "instances_selfcheck", "algorithm": "pt",
            "time": round(seconds, 1), "samples": frames,
            "psnr": round(p, 2),
            "gate": "PASS" if p >= 40.0 else "FAIL"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-t", "--time", type=float, default=30.0,
                    help="render budget per run (reference default 30 s)")
    ap.add_argument("-o", "--out", default="results/bench.csv")
    ap.add_argument("--only", default="", help="substring filter on run names")
    ap.add_argument("--converge", type=float, default=0.0,
                    help="convergence-gate mode: required RMSE (e.g. 2.0); "
                         "the budget becomes a deadline and each run "
                         "PASSes/FAILs (reference run_bench.py:254-296)")
    ap.add_argument("--gate-budgets", default="",
                    help="per-algorithm gate deadlines overriding -t in "
                         "converge mode, e.g. 'pt=60,bpt=180,vcm=300' "
                         "(the reference gates pt/bpt/vcm each for 1 h, "
                         "run_bench.py:254-296)")
    ap.add_argument("--curve-dir", default="",
                    help="write per-run RMSE-over-time CSV curves here")
    ap.add_argument("--curve-every", type=float, default=5.0,
                    help="curve sampling interval in seconds")
    ap.add_argument("--size", type=int, default=0,
                    help="override render size (golden checks then skip)")
    ap.add_argument("--selfcheck-instances", action="store_true",
                    help="run the instanced-vs-flattened image self-check")
    ap.add_argument("--proxies", action="store_true",
                    help="include the BASELINE config-2/4/5 proxy runs "
                         "(1080p full-material PT, PPM at 1M photons/iter, "
                         "instanced VCM)")
    ap.add_argument("--sweep", default="",
                    help="parameter sweep: 'key=v1,v2,v3' repeats every "
                         "selected run once per value (reference harness "
                         "sweeps threads/spp/tile-size, run_bench.py:90-105)."
                         " key is a RenderSettings field (light_path_count,"
                         " num_connections, num_knn, radius_factor, spp,"
                         " max_path_len) or an IMBA_* env knob (e.g."
                         " IMBA_PT_COMPACT_DEPTH)")
    args = ap.parse_args()

    sweep_key, sweep_vals = "", [None]
    if args.sweep:
        sweep_key, vals = args.sweep.split("=", 1)
        sweep_key = sweep_key.strip()
        sweep_vals = [v.strip() for v in vals.split(",") if v.strip()]

    gate_budgets = {}
    if args.gate_budgets:
        for part in args.gate_budgets.split(","):
            k, v = part.split("=")
            gate_budgets[k.strip()] = float(v)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    rows = []
    runs = list(DEFAULT_RUNS)
    if args.proxies or args.only:
        runs += PROXY_RUNS
    for run in runs:
        # --only is a substring filter; a trailing '$' requests an exact
        # name match (cornell_vcm also substring-matches cornell_vcm_front).
        if args.only:
            if args.only.endswith("$"):
                if run[0] != args.only[:-1]:
                    continue
            elif args.only not in run[0]:
                continue
        if args.only == "" and run in PROXY_RUNS and not args.proxies:
            continue
        if not run[1].startswith("proc:") and not os.path.exists(run[1]):
            print(f"skip {run[0]}: scene missing")
            continue
        print(f"== {run[0]} ({run[3]}, {args.time}s) ==", flush=True)
        name, scene_path, golden, algo, w, h, extra = run
        if args.size:
            w = h = args.size
        curve_path = (os.path.join(args.curve_dir, f"curve_{name}.csv")
                      if args.curve_dir else "")
        budget = args.time
        if args.converge > 0 and algo in gate_budgets:
            budget = gate_budgets[algo]
        for sv in sweep_vals:
            run_name, run_extra = name, dict(extra)
            if sv is not None:
                run_name = f"{name}[{sweep_key}={sv}]"
                if sweep_key.startswith("IMBA_"):
                    os.environ[sweep_key] = sv
                else:
                    from imbatracer_tpu.frontend.renderer import \
                        RenderSettings

                    field_t = type(getattr(RenderSettings(), sweep_key))
                    run_extra[sweep_key] = field_t(sv)
                print(f"-- sweep {sweep_key}={sv}", flush=True)
            try:
                row = run_one(run_name, scene_path, golden, algo, w, h,
                              run_extra, seconds=budget,
                              converge_rmse=args.converge,
                              curve_path=curve_path,
                              curve_every=args.curve_every)
            except Exception as e:  # device faults etc.: record + continue
                print(f"FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                row = {"name": run_name, "algorithm": run[3], "time": "",
                       "samples": "", "fps": "", "ms_per_frame": "",
                       "rmse": "", "psnr": "", "error": type(e).__name__}
            print(row, flush=True)
            rows.append(row)
            # Write incrementally so a later crash loses nothing.
            keys = ["name", "algorithm", "time", "samples", "fps",
                    "ms_per_frame", "rmse", "psnr", "converged_at", "gate",
                    "error"]
            with open(args.out, "w", newline="") as f:
                cw = csv.DictWriter(f, fieldnames=keys,
                                    extrasaction="ignore")
                cw.writeheader()
                cw.writerows(rows)
    if args.selfcheck_instances:
        print("== instances_selfcheck ==", flush=True)
        try:
            row = run_instances_selfcheck(seconds=args.time,
                                          size=args.size or 512)
        except Exception as e:
            row = {"name": "instances_selfcheck", "algorithm": "pt",
                   "error": type(e).__name__}
        print(row, flush=True)
        rows.append(row)
        keys = ["name", "algorithm", "time", "samples", "fps",
                "ms_per_frame", "rmse", "psnr", "converged_at", "gate",
                "error"]
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
            w.writeheader()
            w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
