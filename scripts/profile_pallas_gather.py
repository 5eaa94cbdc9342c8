"""Can Pallas/Mosaic do fast per-lane dynamic gathers from VMEM?
Also: how fast are sort-based alternatives in plain XLA?"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(name, fn, *args, n=10):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:46s} {dt*1000:9.3f} ms")
    return dt


R = 1 << 20
N = 8192   # table rows (fits easily in VMEM: 8192*16*4 = 512 KB)
W = 16

rs = np.random.RandomState(0)
table = jnp.asarray(rs.rand(N, W), jnp.float32)
idx = jnp.asarray(rs.randint(0, N, R), jnp.int32)


# --- Pallas: per-block gather, table resident in VMEM -------------------
BLK = 8192


def gather_kernel(idx_ref, tab_ref, out_ref):
    i = idx_ref[:]            # (BLK,)
    out_ref[:] = tab_ref[i]   # per-lane gather from VMEM


def pallas_gather(idx, table):
    grid = (R // BLK,)
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(idx, table)


bench("pallas VMEM gather (N=8192,16) 1M idx",
      jax.jit(lambda i, t: pallas_gather(i, t).sum()), idx, table, n=5)


# --- Pallas: one column only (1D table) ---------------------------------
table1 = table[:, 0].copy()


def gather1_kernel(idx_ref, tab_ref, out_ref):
    out_ref[:] = tab_ref[idx_ref[:]]


def pallas_gather1(idx, table1):
    return pl.pallas_call(
        gather1_kernel,
        out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(R // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
    )(idx, table1)


bench("pallas VMEM gather 1-col 1M idx",
      jax.jit(lambda i, t: pallas_gather1(i, t).sum()), idx, table1, n=5)


# --- XLA baselines ------------------------------------------------------
bench("XLA gather (N=8192,16) random idx",
      jax.jit(lambda t, i: t[i].sum()), table, idx, n=5)

idx_sorted = jnp.sort(idx)
bench("XLA gather (N=8192,16) sorted idx",
      jax.jit(lambda t, i: t[i].sum()), table, idx_sorted, n=5)

# --- Sorting machinery --------------------------------------------------
keys = jnp.asarray(rs.randint(0, N, R), jnp.int32)
payload = [jnp.asarray(rs.rand(R), jnp.float32) for _ in range(8)]
bench("jnp.sort 1M i32", jax.jit(jnp.sort), keys, n=5)
bench("argsort 1M i32", jax.jit(jnp.argsort), keys, n=5)


def multisort(k, *p):
    out = jax.lax.sort((k,) + p, num_keys=1)
    return out[1].sum()


bench("lax.sort key+8 payloads 1M", jax.jit(multisort), keys, *payload, n=5)

# one-hot matmul gather at N=1024 in bf16 (blocked over rays)
N2 = 1024
tab2 = jnp.asarray(rs.rand(N2, W), jnp.float32)
idx2 = jnp.asarray(rs.randint(0, N2, R), jnp.int32)


def onehot_gather(i, t):
    oh = jax.nn.one_hot(i, N2, dtype=jnp.bfloat16)
    return (oh @ t.astype(jnp.bfloat16)).astype(jnp.float32).sum()


bench("one-hot bf16 matmul gather N=1024", jax.jit(onehot_gather), idx2, tab2, n=3)
