"""Does the flat ~0.9 ms / 262k-lane dynamic-gather cost hold for BIG
tables?  The VCM camera pass at 1024^2 gathers light vertices from a
~10M-row (x24 f32) cache; per-unit shading there measures 2x the 512^2
cost (docs/vcm_perf.md round-3 item 4).  Slope-method timing of one
row-gather per step from tables of increasing row count, f32 vs bf16
records."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
sys.path.insert(0, "/root/repo")

from functools import partial

import jax
import jax.numpy as jnp

R = 1 << 18
COLS = 24


@partial(jax.jit, static_argnames=("steps",))
def gather_chain(table, idx0, *, steps):
    def body(i, carry):
        acc, idx = carry
        rows = table[idx]                      # (R, COLS) row gather
        # Step-varying column weights + index fed from the gathered data:
        # a plain rows.sum(1) is a loop-invariant row-sum XLA hoists into
        # ONE pre-pass over the table (measured ~0 ms/step) — the full
        # row must flow into both the accumulator and the next indices.
        w = jnp.cos(jnp.arange(COLS, dtype=table.dtype) * (i + 1.0))
        v = rows @ w
        acc = acc + jnp.tanh(v)
        idx = (idx * jnp.uint32(1664525)
               + jax.lax.bitcast_convert_type(
                   v.astype(jnp.float32), jnp.uint32)
               ) % jnp.uint32(table.shape[0])
        return acc, idx
    acc, _ = jax.lax.fori_loop(0, steps, body,
                               (jnp.zeros((R,), table.dtype), idx0))
    return jnp.sum(acc * acc)


def slope(table, idx0, k1=4, k2=16):
    r1 = gather_chain(table, idx0, steps=k1)
    jax.block_until_ready(r1)
    t0 = time.time()
    jax.block_until_ready(gather_chain(table, idx0, steps=k1))
    ta = time.time() - t0
    jax.block_until_ready(gather_chain(table, idx0, steps=k2))
    t0 = time.time()
    jax.block_until_ready(gather_chain(table, idx0, steps=k2))
    tb = time.time() - t0
    return (tb - ta) / (k2 - k1) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}  R={R} lanes, {COLS} cols/row")
    for rows in (1 << 20, 1 << 22, 1 << 23, 1 << 24):
        table = jax.random.normal(key, (rows, COLS), jnp.float32)
        idx0 = (jax.random.randint(key, (R,), 0, rows)).astype(jnp.uint32)
        ms = slope(table, idx0)
        mb = rows * COLS * 4 / 1e6
        print(f"f32  table {rows:>9} rows ({mb:7.0f} MB): {ms:7.2f} ms/gather")
    for rows in (1 << 22, 1 << 24):
        table = jax.random.normal(key, (rows, COLS), jnp.bfloat16)
        idx0 = (jax.random.randint(key, (R,), 0, rows)).astype(jnp.uint32)
        ms = slope(table, idx0)
        mb = rows * COLS * 2 / 1e6
        print(f"bf16 table {rows:>9} rows ({mb:7.0f} MB): {ms:7.2f} ms/gather")
    # Sorted (coherent) indices: does access order matter at 16M rows?
    rows = 1 << 24
    table = jax.random.normal(key, (rows, COLS), jnp.float32)
    idx0 = jnp.sort((jax.random.randint(key, (R,), 0, rows)).astype(jnp.uint32))
    print(f"f32  16M rows, PRE-SORTED idx:            {slope(table, idx0):7.2f} ms/gather"
          "  (chain re-randomises after step 1; first-step effect only)")


if __name__ == "__main__":
    main()
