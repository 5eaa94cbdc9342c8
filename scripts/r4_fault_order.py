"""Round-4 item 10: retire (or pin down) the fault-ordering convention.

Round 2 recorded a device fault (UNAVAILABLE) when the 264k-tri
unbounded-scattered stream-kernel bench ran repeated inside one jit in
the same process AFTER other benches; since then bench scripts order
fault-prone entries last by convention (CLAUDE.md).  This script
deliberately reproduces the ORIGINAL failing order in a fresh process —
24k-scene benches first, then the 264k scattered stream entries — and
records PASS/FAIL.  Green = drop the convention from CLAUDE.md; red =
this file is the minimal repro.

Writes results/r4_fault_order.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

from bench_stream import bench, boxes_scene, primary_rays, scattered_rays

OUT = "/root/repo/results/r4_fault_order.txt"


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    log(f"# fault-order repro  backend={jax.default_backend()}")
    # Phase 1: the "other benches" — the 24k scene, all stream entries.
    tb_small = boxes_scene(2_000)
    for name, fn, kw in (
        ("24k primary       ", primary_rays, {}),
        ("24k primary tiled ", lambda n: primary_rays(n, tile=16), {}),
        ("24k scattered     ", scattered_rays, {}),
        ("24k scattered sort", scattered_rays, {"sort": True}),
    ):
        try:
            mr = bench(tb_small, 1 << 18, name, fn, **kw)
            log(f"{name.strip()}: {mr:.1f} Mrays/s")
        except Exception as e:
            log(f"{name.strip()}: FAILED {type(e).__name__}: {str(e)[:120]}")

    # Phase 2: the historically fault-prone entries, same process, the
    # order that used to fault (scattered stream before/after sort, no
    # pairs protection).
    tb = boxes_scene(22_000)
    ok = True
    for name, fn, kw in (
        ("264k scattered     ", scattered_rays, {}),
        ("264k scattered sort", scattered_rays, {"sort": True}),
        ("264k primary       ", primary_rays, {}),
        ("264k scattered  #2 ", scattered_rays, {}),
    ):
        try:
            mr = bench(tb, 1 << 18, name, fn, **kw)
            log(f"{name.strip()}: {mr:.1f} Mrays/s")
        except Exception as e:
            ok = False
            log(f"{name.strip()}: FAILED {type(e).__name__}: {str(e)[:120]}")
            break  # a device fault poisons the process; stop here
    log("RESULT: PASS — convention can be retired" if ok
        else "RESULT: FAIL — this script is the minimal repro")


if __name__ == "__main__":
    main()
