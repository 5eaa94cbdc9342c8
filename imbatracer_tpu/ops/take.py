"""Gather-free row fetch for small tables (bit-exact).

Dynamic per-lane gathers lower near-serially on this TPU: a flat
~3.3 ms per 1M lanes regardless of table size or width (CLAUDE.md
design rule).  The PT cost split (results/r4_pt_split.txt) shows the
per-bounce record fetches — not traversal math — dominate the fused
dense cornell frame.  For *small* tables there are two cheaper, exact
formulations:

- ``select``: a statically unrolled where-chain over the rows (the
  lights-table trick, render/lights.py::_fetch_rows).  Pure VPU
  selects, ~free for tables up to a few dozen rows.
- ``mxu``: a one-hot matmul.  Each f32 payload word is bitcast to
  uint32 and split into its two 16-bit halves; each half (an integer
  <= 65535, exactly representable in f32) is fetched with
  ``onehot @ half`` under ``Precision.HIGHEST`` (the bf16x3 operand
  split is lossless for 24-bit mantissas, and each output sums exactly
  one nonzero product), then the halves are reassembled and bitcast
  back.  The round trip is BIT-EXACT for every payload — floats,
  bitcast ints, NaN, denormals — so callers can swap it in without any
  estimator or layout change.

Reference role: these replace the per-hit ``calculate_intersection``
loads (reference: render/integrators/integrator.h:71-123) on the TPU's
terms — feed the MXU instead of fighting the gather unit.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Row-count ceilings per tier (env-tunable for A/B runs).
SELECT_MAX_ROWS = int(os.environ.get("IMBA_TAKE_SELECT_MAX", "64"))
# Measured (results/r4_chain6.log): mxu wins the fused dense cornell
# frame at 36 rows (88.2 vs 102.5 ms gather, 93.2 select) and loses
# ~3% at 2188 rows — same-tree controls in r4_chain14.log: gather
# bpt 2165 / vcm 4187 ms vs mxu 2240 / 4285 and mxu8 2212 / 4237
# (chain12), so above the tier EVERY one-hot variant loses.  The cost
# model (2 f32 HIGHEST dots of R x T x 48) crosses the ~0.9 ms/262k-lane
# gather around T~1k; 512 is the conservative default ceiling.
MXU_MAX_ROWS = int(os.environ.get("IMBA_TAKE_MXU_MAX", "512"))
# Routing override: "auto" | "gather" | "select" | "mxu".
TAKE_MODE = os.environ.get("IMBA_TAKE", "auto")


def take_rows_select(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(T, K) table, (R,) i32 idx -> (K, R) via an unrolled select chain."""
    T = table.shape[0]
    rec_t = jnp.broadcast_to(table[0][:, None], (table.shape[1],) + idx.shape)
    for r in range(1, T):
        rec_t = jnp.where((idx == r)[None, :], table[r][:, None], rec_t)
    return rec_t


def take_rows_mxu(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(T, K) f32 table, (R,) i32 idx -> (K, R), bit-exact one-hot matmul."""
    T = table.shape[0]
    bits = jax.lax.bitcast_convert_type(table, jnp.uint32)
    hi = (bits >> 16).astype(jnp.float32)
    lo = (bits & jnp.uint32(0xFFFF)).astype(jnp.float32)
    onehot = (idx[:, None] == jnp.arange(T, dtype=idx.dtype)[None, :]).astype(
        jnp.float32)
    # HIGHEST: the bf16x3 operand split reconstructs 24-bit mantissas
    # exactly, and one-hot rows make every output a single product.
    dot = lambda m: jax.lax.dot(onehot, m,
                                precision=jax.lax.Precision.HIGHEST)
    h = dot(hi)
    l = dot(lo)
    out = (jnp.round(h).astype(jnp.uint32) << 16) | jnp.round(l).astype(
        jnp.uint32)
    return jax.lax.bitcast_convert_type(out, jnp.float32).T


def take_rows_mxu8(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(T, K) f32 table, (R,) i32 idx -> (K, R): one bf16 one-hot matmul.

    Byte-plane variant of :func:`take_rows_mxu`.  Each payload word is
    split into four 8-bit planes, concatenated along the width, and
    fetched with a SINGLE default-precision dot: integers <= 255 and the
    one-hot's 0/1 are exact in bf16, and every output row sums exactly
    one nonzero product into the f32 accumulator, so the round trip is
    bit-exact (floats, ints, NaN, denormals) like the 16-bit variant.

    vs take_rows_mxu: one 1-pass bf16 dot over 4K width instead of two
    HIGHEST (bf16x3 multi-pass) f32 dots over 2K, and the (R, T) one-hot
    is staged once in bf16 instead of twice in f32.

    Measured (r4_chain12, fused dense cornell 1024², 36-row tables): the
    byte-plane fetch LOSES — 69.8 vs 56.3 ms/frame (ablated fetch cost
    26.4 vs 14.5 ms).  At tiny T the dots are operand-staging-bound, so
    doubling the output width (4K vs 2K) costs more than dropping
    HIGHEST saves.  Stays opt-in (IMBA_TAKE=mxu8); the large-T crossover
    (2188-row specular cornell) is A/B'd in chain14.
    """
    T, K = table.shape
    bits = jax.lax.bitcast_convert_type(table, jnp.uint32)
    planes = [((bits >> (8 * p)) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
              for p in range(4)]
    wide = jnp.concatenate(planes, axis=1)          # (T, 4K) bf16
    onehot = (idx[:, None] == jnp.arange(T, dtype=idx.dtype)[None, :]).astype(
        jnp.bfloat16)
    out = jax.lax.dot(onehot, wide,
                      preferred_element_type=jnp.float32)  # (R, 4K)
    w = jnp.uint32(0)
    for p in range(4):
        b = jnp.round(out[:, p * K:(p + 1) * K]).astype(jnp.uint32)
        w = w | (b << (8 * p))
    return jax.lax.bitcast_convert_type(w, jnp.float32).T


def take_rows_t(table: jnp.ndarray, idx: jnp.ndarray,
                mode: str | None = None) -> jnp.ndarray:
    """Fetch rows of a (T, K) f32 table at per-lane indices, transposed.

    Returns (K, R) — the transposed wide-record form every shading
    consumer wants (row slices of (K, R) are contiguous; column
    extracts of (R, K) are cross-lane shuffles, ~6x slower).

    mode=None uses the IMBA_TAKE env routing; "auto" picks the
    cheapest exact tier by row count.  All tiers are bit-exact, so
    routing is a pure performance decision.
    """
    mode = TAKE_MODE if mode is None else mode
    T = table.shape[0]
    if mode == "auto":
        # TPU-only: CPU gathers are fast and the one-hot matmul is not.
        # The select tier measured SLOWER than mxu even at 36 rows
        # (93.2 vs 88.2 ms/frame, r4_chain6) so auto never picks it.
        if jax.default_backend() == "tpu" and T <= MXU_MAX_ROWS:
            mode = "mxu"
        else:
            mode = "gather"
    if mode == "select":
        return take_rows_select(table, idx)
    if mode == "mxu":
        return take_rows_mxu(table, idx)
    if mode == "mxu8":
        return take_rows_mxu8(table, idx)
    return table[idx].T
