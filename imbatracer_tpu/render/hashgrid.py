"""Fixed-radius kNN hash grid, built with sort + searchsorted (device-side).

The reference builds a 3D hash grid with an atomic counting sort and
answers queries with per-photon insertion sort
(reference: rangesearch/rangesearch.h:24-129).  The TPU formulation is
fully data-parallel: photons are sorted by hashed cell id, per-cell ranges
come from one `searchsorted`, and a query examines the same 8 neighbour
cells (2x2x2 block chosen by the fractional cell coordinate,
rangesearch.h:90-97) through fixed-size windows + `top_k` — no atomics, no
data-dependent loops.

Hash collisions only add candidates that the radius filter rejects, as in
the reference (same 73856093/19349663/83492791 hash, rangesearch.h:137-140).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class HashGrid:
    sorted_pos: jnp.ndarray   # (P, 3) photon positions in cell order
    sorted_idx: jnp.ndarray   # (P,) original photon indices
    cell_start: jnp.ndarray   # (C + 1,) range boundaries per cell id
    bbox_min: jnp.ndarray     # (3,)
    inv_cell: jnp.ndarray     # ()
    radius_sqr: jnp.ndarray   # ()


def _cell_hash(cx, cy, cz, table_size: int):
    h = (
        (cx.astype(jnp.uint32) * jnp.uint32(73856093))
        ^ (cy.astype(jnp.uint32) * jnp.uint32(19349663))
        ^ (cz.astype(jnp.uint32) * jnp.uint32(83492791))
    )
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("table_size",))
def build_hash_grid(pos, valid, radius, table_size: int) -> HashGrid:
    """pos: (P, 3); valid: (P,) bool; radius: scalar.  Invalid photons are
    routed to the out-of-range cell `table_size` and never matched."""
    big = jnp.float32(1e30)
    vpos = jnp.where(valid[:, None], pos, big)
    bbox_min = jnp.min(jnp.where(valid[:, None], pos, big), axis=0)
    bbox_max = jnp.max(jnp.where(valid[:, None], pos, -big), axis=0)
    # Guard the empty-grid case so arithmetic stays finite.
    any_valid = jnp.any(valid)
    bbox_min = jnp.where(any_valid, bbox_min, 0.0)
    bbox_max = jnp.where(any_valid, bbox_max, 1.0)
    ext = bbox_max - bbox_min
    bbox_min = bbox_min - ext * 1e-3 - 1e-6
    inv_cell = 1.0 / jnp.maximum(2.0 * radius, 1e-12)

    c = jnp.floor((pos - bbox_min) * inv_cell).astype(jnp.int32)
    h = _cell_hash(c[:, 0], c[:, 1], c[:, 2], table_size)
    h = jnp.where(valid, h, table_size)

    order = jnp.argsort(h)
    h_sorted = h[order]
    cell_start = jnp.searchsorted(
        h_sorted, jnp.arange(table_size + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return HashGrid(
        sorted_pos=jnp.where(valid[order][:, None], pos[order], big),
        sorted_idx=order.astype(jnp.int32),
        cell_start=cell_start,
        bbox_min=bbox_min,
        inv_cell=inv_cell,
        radius_sqr=radius * radius,
    )


@partial(jax.jit, static_argnames=("k", "max_per_cell", "table_size"))
def query_knn(grid: HashGrid, qpos, k: int, max_per_cell: int, table_size: int):
    """k nearest photons within the grid radius around each query point.

    qpos: (R, 3).  Returns (idx (R, k) into the original photon arrays or
    -1, dist_sqr (R, k), count (R,)).  Each of the 8 neighbour cells
    contributes at most `max_per_cell` candidates (overflow is dropped —
    the cap substitutes for the reference's unbounded per-cell walk).
    """
    cellf = (qpos - grid.bbox_min) * grid.inv_cell
    coord = jnp.floor(cellf)
    fract = cellf - coord
    base = coord.astype(jnp.int32)
    off = jnp.where(fract < 0.5, -1, 1)

    cand_idx = []
    cand_d2 = []
    ar = jnp.arange(max_per_cell, dtype=jnp.int32)
    for j in range(8):
        cx = base[:, 0] + (off[:, 0] if j & 4 else 0)
        cy = base[:, 1] + (off[:, 1] if j & 2 else 0)
        cz = base[:, 2] + (off[:, 2] if j & 1 else 0)
        h = _cell_hash(cx, cy, cz, table_size)
        start = grid.cell_start[h]
        end = grid.cell_start[h + 1]
        idx = start[:, None] + ar[None, :]
        in_range = idx < end[:, None]
        idx = jnp.where(in_range, idx, 0)
        p = grid.sorted_pos[idx]
        d2 = jnp.sum((p - qpos[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(in_range & (d2 <= grid.radius_sqr), d2, jnp.float32(1e30))
        cand_idx.append(jnp.where(in_range, grid.sorted_idx[idx], -1))
        cand_d2.append(d2)

    all_idx = jnp.concatenate(cand_idx, axis=1)
    all_d2 = jnp.concatenate(cand_d2, axis=1)

    neg_top, pos_in_cand = jax.lax.top_k(-all_d2, k)
    top_d2 = -neg_top
    top_idx = jnp.take_along_axis(all_idx, pos_in_cand, axis=1)
    found = top_d2 < 1e29
    top_idx = jnp.where(found, top_idx, -1)
    count = jnp.sum(found.astype(jnp.int32), axis=-1)
    return top_idx, top_d2, count
