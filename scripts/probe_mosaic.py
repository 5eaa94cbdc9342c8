"""Probe Mosaic/TPU features the round-2 streamed traversal kernel needs.

Each probe is independent and prints PASS/FAIL + timings.  Timings use the
slope method (two iteration counts inside one jit) because the axon tunnel
adds ~33 ms per forced read.

Probes:
  1. dynamic-bound fori_loop inside a kernel (trip count from SMEM scalar)
  2. SMEM BlockSpec input + dynamic-index scalar read
  3. SMEM scratch dynamic-index write (in-kernel compaction)
  4. manual async DMA HBM(ANY) -> VMEM scratch, dynamic source row
  5. per-iteration fori overhead (ns/iter, tiny body)
  6. pl.when(jnp.any(x)) cost per branch
  7. in-kernel f32 matmul throughput (precision HIGHEST)
  8. double-buffered DMA streaming throughput
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    return out, (t1 - t0)


def probe(name):
    def deco(f):
        try:
            f()
            print(f"PASS {name}")
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"FAIL {name}: {type(e).__name__}: {msg}")
    return deco


# ---------------------------------------------------------------- probe 1+2
@probe("1+2 dynamic fori bound from SMEM input + dynamic scalar read")
def _():
    S = 64

    def kernel(cnt_ref, lst_ref, x_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        n = cnt_ref[0, 0]

        def body(k, _):
            idx = lst_ref[0, k]          # dynamic scalar read from SMEM
            o_ref[:] += x_ref[:] * idx.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, n, body, 0)

    cnt = jnp.array([[5]], jnp.int32)
    lst = jnp.arange(S, dtype=jnp.int32).reshape(1, S)
    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(cnt, lst, x)
    expect = float(0 + 1 + 2 + 3 + 4)
    np.testing.assert_allclose(np.asarray(out)[0, 0], expect)


# ------------------------------------------------------------------ probe 3
@probe("3 SMEM scratch dynamic write (compaction)")
def _():
    def kernel(x_ref, o_ref, lst_ref, cnt_ref):
        cnt_ref[0] = 0
        for c in range(16):                      # unrolled static reads
            flag = x_ref[c, 0] > 0.0             # scalar read, static index

            @pl.when(flag)
            def _():
                lst_ref[cnt_ref[0]] = c          # dynamic SMEM write
                cnt_ref[0] = cnt_ref[0] + 1

        o_ref[:] = jnp.zeros_like(o_ref)
        n = cnt_ref[0]

        def body(k, _):
            o_ref[:] += jnp.full_like(o_ref[:], lst_ref[k].astype(jnp.float32))
            return 0

        jax.lax.fori_loop(0, n, body, 0)

    x = np.zeros((16, 128), np.float32)
    x[3, 0] = 1.0
    x[7, 0] = 1.0
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((16,), jnp.int32), pltpu.SMEM((1,), jnp.int32)],
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out)[0, 0], 10.0)  # 3 + 7


# ------------------------------------------------------------------ probe 4
@probe("4 manual DMA ANY->VMEM with dynamic source row")
def _():
    S, R, W = 16, 64, 128

    def kernel(idx_ref, tiles_ref, o_ref, scratch, sem):
        sc = idx_ref[0, 0]
        dma = pltpu.make_async_copy(
            tiles_ref.at[pl.ds(sc * R, R), :], scratch, sem
        )
        dma.start()
        dma.wait()
        o_ref[:] = scratch[0:8, :]

    tiles = jnp.arange(S * R * W, dtype=jnp.float32).reshape(S * R, W)
    idx = jnp.array([[3]], jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(idx, tiles)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 3 * R * W)


# ------------------------------------------------------------------ probe 5
@probe("5 fori per-iteration overhead")
def _():
    def make(n_iter):
        def kernel(x_ref, o_ref):
            def body(i, acc):
                return acc * 1.0000001 + 0.5

            acc = jax.lax.fori_loop(0, n_iter, body, x_ref[0, 0])
            o_ref[:] = jnp.full_like(o_ref[:], acc)

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        return run

    x = jnp.ones((8, 128), jnp.float32)
    f1, f2 = make(10_000), make(1_000_000)
    _, t1 = timed(f1, x)
    _, t2 = timed(f2, x)
    ns = (t2 - t1) / (1_000_000 - 10_000) * 1e9
    print(f"    scalar fori: {ns:.1f} ns/iter")


# ------------------------------------------------------------------ probe 6
@probe("6 pl.when(jnp.any(vec)) branch cost")
def _():
    BLK = 512

    def make(n_iter, taken):
        def kernel(x_ref, o_ref, best):
            best[:] = x_ref[:]

            def body(i, _):
                v = best[0:1, :] * (1.0 if taken else 0.0)
                flag = jnp.any(v > 0.5)

                @pl.when(flag)
                def _():
                    best[0:1, :] = best[0:1, :] * 1.0000001

                return 0

            jax.lax.fori_loop(0, n_iter, body, 0)
            o_ref[:] = best[:]

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, BLK), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((8, BLK), jnp.float32)],
            )(x)
        return run

    x = jnp.ones((8, BLK), jnp.float32)
    for taken in (False, True):
        f1, f2 = make(1_000, taken), make(100_000, taken)
        _, t1 = timed(f1, x)
        _, t2 = timed(f2, x)
        ns = (t2 - t1) / 99_000 * 1e9
        print(f"    any+when taken={taken}: {ns:.1f} ns/iter")


# ------------------------------------------------------------------ probe 7
@probe("7 in-kernel f32 matmul (HIGHEST) throughput")
def _():
    M, K, N = 256, 16, 1024

    def make(n_iter):
        def kernel(a_ref, b_ref, o_ref):
            def body(i, acc):
                return acc + jax.lax.dot_general(
                    a_ref[:], b_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ) * 1e-9

            acc = jax.lax.fori_loop(
                0, n_iter, body, jnp.zeros((M, N), jnp.float32)
            )
            o_ref[:] = acc

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)
        return run

    a = jnp.ones((M, K), jnp.float32)
    b = jnp.ones((K, N), jnp.float32)
    f1, f2 = make(100), make(10_000)
    _, t1 = timed(f1, a, b)
    _, t2 = timed(f2, a, b)
    per = (t2 - t1) / 9_900
    fl = 2 * M * K * N / per / 1e12
    print(f"    ({M}x{K})@({K}x{N}) f32: {per * 1e6:.2f} us/mm -> {fl:.2f} TFLOP/s")


# ------------------------------------------------------------------ probe 8
@probe("8 DMA streaming throughput (64KB tiles)")
def _():
    S, R, W = 64, 128, 128  # 64 tiles x 64KB

    def make(n_iter):
        def kernel(tiles_ref, o_ref, scratch, sem):
            def body(i, acc):
                sc = i % S
                slot = i % 2
                dma = pltpu.make_async_copy(
                    tiles_ref.at[pl.ds(sc * R, R), :],
                    scratch.at[slot], sem.at[slot],
                )
                dma.start()
                dma.wait()
                return acc + scratch[slot][0, 0]

            acc = jax.lax.fori_loop(0, n_iter, body, 0.0)
            o_ref[:] = jnp.full_like(o_ref[:], acc)

        @jax.jit
        def run(tiles):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, R, W), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )(tiles)
        return run

    tiles = jnp.ones((S * R, W), jnp.float32)
    f1, f2 = make(100), make(10_000)
    _, t1 = timed(f1, tiles)
    _, t2 = timed(f2, tiles)
    per = (t2 - t1) / 9_900
    bw = R * W * 4 / per / 1e9
    print(f"    64KB DMA wait-each: {per * 1e6:.2f} us -> {bw:.1f} GB/s")


print("backend:", jax.default_backend())
