"""Round-4 probe: what does a data-dependent lax.while_loop actually cost
per iteration through the tunneled TPU runtime, vs a static-trip fori_loop
with the same body?

Context: CLAUDE.md records "while_loop with a data-dependent cond syncs
per iteration (~33 ms)" from round 1.  The masked-traversal rework
(traverse._closest_hit_masked) wants a while over compacted re-trace
dispatches; this probe decides whether that design pays a per-iteration
tunnel penalty or runs device-side like ordinary XLA While.

Method: one jit containing a while_loop whose trip count K is data-
dependent (carried counter vs a device scalar), body = enough fused math
to be visible.  Slope of t(K) over K isolates per-iteration cost; the
fori_loop twin with static K is the control.

Writes results/r4_while_probe.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = "/root/repo/results/r4_while_probe.txt"
R = 1 << 18


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def body_math(x):
    # ~40 fused elementwise ops on (R,) f32 — visible but cheap.
    for _ in range(10):
        x = x * 1.000001 + 0.5
        x = jnp.abs(x) * 0.999999 - 0.25
    return x


@jax.jit
def run_while(x, k):
    def cond(st):
        i, _ = st
        return i < k

    def body(st):
        i, x = st
        return i + 1, body_math(x)

    _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
    return jnp.sum(x * x)  # nonlinear consume


@jax.jit
def run_fori(x, k_static):
    def body(i, x):
        return body_math(x)

    x = jax.lax.fori_loop(0, k_static, body, x)
    return jnp.sum(x * x)


def time_it(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    x = jnp.linspace(0.0, 1.0, R, dtype=jnp.float32)
    log(f"# while-loop probe  backend={jax.default_backend()}  R={R}")
    for k in (1, 8, 64):
        tw = time_it(run_while, x, jnp.int32(k))
        log(f"while k={k:3d}: {tw:8.3f} ms")
    # slope: per-iteration cost
    t8 = time_it(run_while, x, jnp.int32(8))
    t64 = time_it(run_while, x, jnp.int32(64))
    log(f"while slope: {(t64 - t8) / 56:8.4f} ms/iter")
    for k in (8, 64):
        tf = time_it(run_fori, x, k)
        log(f"fori  k={k:3d}: {tf:8.3f} ms")
    log(f"fori slope: {(time_it(run_fori, x, 64) - time_it(run_fori, x, 8)) / 56:8.4f} ms/iter")


if __name__ == "__main__":
    main()
