"""Pallas TPU kernel: sort-merge-join photon gather for vertex merging.

Plays the role of the reference's hash-grid range search
(reference: rangesearch/rangesearch.h:77-129, used by the VCM integrator's
vertex merging, vcm.cpp:571-611).  The XLA formulation
(render/hashgrid.cell_windows) pays a near-serial windowed gather per
neighbour cell — measured ~22 ms/cell at 262k queries, ~70% of a VCM
frame (docs/vcm_perf.md).  This kernel removes per-query gathers
entirely with a sort-merge join:

* Photons are sorted by a LINEAR (order-preserving, non-hashed) cell key
  and packed into component-major HBM tiles (16, PT) — photons on lanes,
  record rows on sublanes — so a block's candidates are one dense DMA.
* Queries are sorted by their own cell key; a block of BLKQ sorted
  queries covers a CONTIGUOUS photon-key range per neighbour-cell offset.
  The XLA side computes each block's photon tile span (two tiny
  searchsorted calls per combo) and ships them as SMEM scalars.
* The kernel walks each span with double-buffered DMA and evaluates all
  (query, photon) pairs of the block densely: cell membership is a pure
  data compare (photon key == query key), never an index — Mosaic cannot
  gather by lane, so the join replaces indexing with comparison.
* The walk is UNBOUNDED (every photon of every candidate cell run is
  examined), unlike the XLA window's first-W-per-cell truncation — the
  kernel is *exact* where the window is approximate.

Neighbourhood enumeration: with cell size 2r, all photons within r of a
query lie in the 2x2x2 cell block anchored at m = floor(cell_coord - 0.5)
(same selection as the reference, rangesearch.h:90-97).  In the linear
key ((cx * G) + cy) * G + cz the two z-cells {mz, mz+1} are ADJACENT
keys, so the 8 cells are 4 contiguous key pairs — 4 spans per block,
each tested as (key == k) | (key == k + 1).

Key arithmetic is carried in exactly-representable f32 integers: grid
dims are clamped to G = 256 per axis so keys < 2^24 (cells beyond the
clamp alias into the boundary cell; aliased candidates are rejected by
the radius test, so clamping degrades locality, never correctness —
the same safety argument as the reference's hash collisions).
Clamp-induced duplicate combos (a query at the grid edge whose mx and
mx+1 clamp together) are deduplicated on the XLA side (key -> -2), so
no photon is ever counted twice.

BSDF evaluation (the merge weight needs f, pdf_dir, pdf_rev at each
pair) is inlined in component form for the non-delta kinds
(render/materials.py is the specification); kinds absent from the scene
are compiled out via the static `kinds` argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import flax.struct

import os

# Queries per block and photons per HBM tile.  The kernel is pair-walk
# compute bound: pair slots = sum over block-combos of (photon key-range
# span rounded to PT) x BLKQ, so BOTH smaller blocks (narrower key
# ranges) and smaller tiles (less rounding) cut the walk, traded against
# per-block/per-tile fixed costs (fori setup + DMA latency).  Swept on
# TPU at 262k queries / 262k photons (r5_merge_blkq.txt, chain35):
# (256,512) 73.6 -> (128,512) 63.9 -> (128,256) 62.8 ms/dispatch with
# (64,256) tied at 62.3; BLKQ=512 scoped-VMEM OOMs.  Defaults are the
# (128,256) knee.  Mutable module globals (tests/probes assign them);
# env knobs for production tuning.
BLKQ = int(os.environ.get("IMBA_MERGE_BLKQ", "128"))
PT = int(os.environ.get("IMBA_MERGE_PT", "256"))  # photons per HBM tile
GRID = 256          # cells per axis (keys < 256^3 = 2^24, exact in f32)
PAD_KEY = 1 << 25   # > any real key, exact in f32
BIG = 1e30
INV_PI = 1.0 / jnp.pi

# Flip to run the kernel in interpreter mode (CPU tests).
INTERPRET = False


def _use_union() -> bool:
    """Walk the UNION of the 4 combo tile spans (each tile once,
    pair-test matches any combo key) instead of the concatenated
    per-combo spans.  Read at trace time; IMBA_MERGE_UNION=0 restores
    the per-combo walk."""
    return os.environ.get("IMBA_MERGE_UNION", "1") != "0"

# Query record columns (f32, width 40):
#   0:3   pos
#   3:6   tangent      (Duff ONB of the shading normal, core/sampling.py)
#   6:9   bitangent
#   9:12  shading normal
#   12:15 geometric normal
#   15:18 lo = w_out in the local frame
#   18    s_o = dot(w_out, gn)
#   19    d_vcm
#   20    d_vm
#   21    kind (small int as f32)
#   22:25 kd
#   25:28 ks
#   28    ns
#   29:33 cell key of combo c in {(0,0),(0,1),(1,0),(1,1)} (f32; -2 =
#         combo invalid / query inactive)
#   33    active (1.0 / 0.0)
#   34:40 pad
QREC_W = 40

# Photon tile rows (16, PT):
#   0:3   pos            (BIG for padding)
#   3     cell key       (f32 integer; PAD_KEY for padding)
#   4:7   w_in  (the photon's incoming light direction = stored w_out)
#   7:10  throughput
#   10    d_vcm
#   11    d_vm
#   12:16 pad
PREC_ROWS = 16

MAT_DIFFUSE = 0
MAT_GLOSSY = 3
MAT_PHONG = 4
MAT_OREN_NAYAR = 5


@flax.struct.dataclass
class MergeGrid:
    """Photon store for the Pallas merge kernel (built once per frame)."""
    tiles: jnp.ndarray       # (T, 16, PT) f32 component-major photon tiles
    keys: jnp.ndarray        # (T*PT,) i32 sorted cell keys (PAD at the end)
    bbox_min: jnp.ndarray    # (3,)
    inv_cell: jnp.ndarray    # ()
    radius_sqr: jnp.ndarray  # ()


@functools.partial(jax.jit, static_argnames=())
def build_merge_grid(pos, valid, radius, w_in, throughput, d_vcm,
                     d_vm) -> MergeGrid:
    """Sort photons by linear cell key and pack the HBM tiles.

    pos (P,3); valid (P,) bool; radius scalar; w_in/throughput (P,3);
    d_vcm/d_vm (P,).  P is padded up to a PT multiple."""
    num_p = pos.shape[0]
    big = jnp.float32(BIG)
    bbox_min = jnp.min(jnp.where(valid[:, None], pos, big), axis=0)
    bbox_max = jnp.max(jnp.where(valid[:, None], pos, -big), axis=0)
    any_valid = jnp.any(valid)
    bbox_min = jnp.where(any_valid, bbox_min, 0.0)
    bbox_max = jnp.where(any_valid, bbox_max, 1.0)
    ext = bbox_max - bbox_min
    bbox_min = bbox_min - ext * 1e-3 - 1e-6
    # Cell size: >= 2r for the 2x2x2 cover argument, AND large enough
    # that the grid FITS GRID^3 — cells beyond the clamp would alias
    # into boundary mega-cells whose photon runs every nearby block
    # walks (measured: a progressive-radius cornell run spent ~1.9 s of
    # a 512² frame in exactly that before this guard).  Oversized cells
    # stay exact: a point within r of a query is still inside the
    # 2x2x2 block for any cell >= 2r; only the per-cell candidate count
    # grows (rejected by the radius test).
    cell = jnp.maximum(2.0 * radius,
                       jnp.max(ext) * 1.01 / GRID)
    inv_cell = 1.0 / jnp.maximum(cell, 1e-12)

    c = jnp.clip(jnp.floor((pos - bbox_min) * inv_cell).astype(jnp.int32),
                 0, GRID - 1)
    key = (c[:, 0] * GRID + c[:, 1]) * GRID + c[:, 2]
    key = jnp.where(valid, key, jnp.int32(PAD_KEY))

    iota = jnp.arange(num_p, dtype=jnp.int32)
    keys_sorted, order = jax.lax.sort((key, iota), num_keys=1)

    vs = valid[order]
    rec = jnp.concatenate(
        [
            jnp.where(vs[:, None], pos[order], big),           # 0:3
            keys_sorted.astype(jnp.float32)[:, None],          # 3
            w_in[order],                                       # 4:7
            throughput[order],                                 # 7:10
            d_vcm[order][:, None],                             # 10
            d_vm[order][:, None],                              # 11
            jnp.zeros((num_p, PREC_ROWS - 12), jnp.float32),   # pad
        ],
        axis=1,
    )
    pad = (-num_p) % PT
    if pad:
        prow = jnp.zeros((pad, PREC_ROWS), jnp.float32)
        prow = prow.at[:, 0:3].set(big)
        prow = prow.at[:, 3].set(float(PAD_KEY))
        rec = jnp.concatenate([rec, prow], axis=0)
        keys_sorted = jnp.concatenate(
            [keys_sorted, jnp.full((pad,), PAD_KEY, jnp.int32)]
        )
    num_t = rec.shape[0] // PT
    tiles = rec.T.reshape(PREC_ROWS, num_t, PT).transpose(1, 0, 2)
    return MergeGrid(
        tiles=tiles, keys=keys_sorted, bbox_min=bbox_min,
        inv_cell=inv_cell, radius_sqr=radius * radius,
    )


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

def _make_kernel(kinds: tuple, ppm: bool, union: bool):
    has_glossy = MAT_GLOSSY in kinds
    has_phong = MAT_PHONG in kinds
    has_oren = MAT_OREN_NAYAR in kinds

    def kernel(qrec_ref, spans_ref, scal_ref, ptiles_ref, out_ref,
               acc_ref, ptile_ref, sem_ref):
        # NB spans/scal ride in SMEM as 3-D blocks with the grid dim
        # leading — the Mosaic block rule (see ops/pallas_pairs.py).
        col = lambda c: qrec_ref[:, c : c + 1]            # (BLKQ, 1)
        qx, qy, qz = col(0), col(1), col(2)
        tx, ty, tz = col(3), col(4), col(5)
        bx, by, bz = col(6), col(7), col(8)
        nx, ny, nz = col(9), col(10), col(11)
        gx, gy, gz = col(12), col(13), col(14)
        lox, loy, loz = col(15), col(16), col(17)
        s_o = col(18)
        q_dvcm, q_dvm = col(19), col(20)
        kind = col(21)
        kdx, kdy, kdz = col(22), col(23), col(24)
        ksx, ksy, ksz = col(25), col(26), col(27)
        ns = col(28)
        qact = col(33) > 0.5

        r2 = scal_ref[0, 0, 0]
        eta_vc = scal_ref[0, 0, 1]
        inv_r2 = 1.0 / jnp.maximum(r2, 1e-30)

        zeros = jnp.zeros_like(qx)
        acc_ref[:, :] = jnp.concatenate([zeros] * 8, axis=1)

        def tile_dma(ti, slot):
            return pltpu.make_async_copy(
                ptiles_ref.at[ti], ptile_ref.at[slot], sem_ref.at[slot]
            )

        def process(slot, qk):
            row = lambda r: ptile_ref[slot, r : r + 1, :]   # (1, PT)
            px, py, pz = row(0), row(1), row(2)
            pkey = row(3)
            wix, wiy, wiz = row(4), row(5), row(6)
            tpx, tpy, tpz = row(7), row(8), row(9)
            p_dvcm, p_dvm = row(10), row(11)

            dxx = px - qx                                    # (BLKQ, PT)
            dyy = py - qy
            dzz = pz - qz
            d2 = dxx * dxx + dyy * dyy + dzz * dzz
            if union:
                # Union walk: each tile is visited ONCE; a photon pairs
                # with a query when its cell key matches ANY of the 4
                # combo key pairs.  Invalid combos carry key -2, which
                # no photon key (>= 0 or PAD_KEY) can equal, so they
                # never match.  8 extra f32 compares per pair slot buy
                # ~49% fewer tile-steps (the combo spans overlap —
                # results/r5_qrow_split.txt "dedup-steps").
                qk0u, qk1u, qk2u, qk3u = (col(29), col(30), col(31),
                                          col(32))
                match = ((pkey == qk0u) | (pkey == qk0u + 1.0)
                         | (pkey == qk1u) | (pkey == qk1u + 1.0)
                         | (pkey == qk2u) | (pkey == qk2u + 1.0)
                         | (pkey == qk3u) | (pkey == qk3u + 1.0))
                ok = match & (d2 <= r2) & qact
            else:
                ok = ((pkey == qk) | (pkey == qk + 1.0)) & (d2 <= r2)
                ok = ok & qact & (qk >= 0.0)

            # Photon incoming direction in the query's local frame.
            li_x = wix * tx + wiy * ty + wiz * tz
            li_y = wix * bx + wiy * by + wiz * bz
            li_z = wix * nx + wiy * ny + wiz * nz
            s_i = wix * gx + wiy * gy + wiz * gz
            ok = ok & (s_o * s_i > 0.0) & (loz * li_z > 0.0)

            # f = kd * A + ks * B; pdf_dir / pdf_rev per kind
            # (render/materials.py eval_bsdf / pdf_bsdf in component
            # form; delta kinds keep A = B = 0 -> pair rejected).
            abs_liz = jnp.abs(li_z)
            abs_loz = jnp.abs(loz)
            pdf_cos_dir = abs_liz * INV_PI
            pdf_cos_rev = abs_loz * INV_PI

            is_diff = kind == float(MAT_DIFFUSE)
            a_term = jnp.where(is_diff, INV_PI, 0.0) * jnp.ones_like(d2)
            b_term = jnp.zeros_like(d2)
            pdf_dir = jnp.where(is_diff, pdf_cos_dir, 0.0)
            pdf_rev = jnp.where(is_diff, pdf_cos_rev, 0.0)

            if has_glossy or has_phong:
                # Half-vector quantities (shared by Cook-Torrance).
                hx = lox + li_x
                hy = loy + li_y
                hz = loz + li_z
                h_len = jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz,
                                             1e-20))
                hzn = hz / h_len

            if has_glossy:
                # 0.5 * (CookTorrance(ks, Fr(1, ns), ns) + Lambert(kd))
                # (materials.py _ct_eval/_ct_pdf; brdfs.h:146-227).
                o_dot_h = (lox * hx + loy * hy + loz * hz) / h_len
                i_dot_h = (li_x * hx + li_y * hy + li_z * hz) / h_len
                cos_half = i_dot_h
                c2 = cos_half * cos_half
                ekc = (1.0 + ns * ns) * c2
                two_ec = 2.0 * cos_half
                fr = 0.5 * ((ekc - two_ec + 1.0) / (ekc + two_ec + 1.0)
                            + (1.0 + ns * ns - two_ec + c2)
                            / (1.0 + ns * ns + two_ec + c2))
                abs_hz = jnp.abs(hzn)
                d_blinn = (ns + 2.0) / (2.0 * jnp.pi) * jnp.power(
                    jnp.maximum(abs_hz, 1e-12), ns)
                odh = jnp.maximum(o_dot_h, 1e-12)
                g = jnp.minimum(
                    1.0,
                    jnp.minimum(2.0 * abs_hz * abs_loz / odh,
                                2.0 * abs_hz * abs_liz / odh),
                )
                ct = (d_blinn * g * fr) / (
                    4.0 * jnp.maximum(abs_liz * abs_loz, 1e-12))
                pdf_h = (ns + 1.0) * jnp.power(
                    jnp.maximum(abs_hz, 1e-12), ns) / (
                    2.0 * jnp.pi * 4.0 * odh)
                pdf_h = jnp.where(o_dot_h > 0.0, pdf_h, 0.0)
                idh = jnp.maximum(i_dot_h, 1e-12)
                pdf_h_rev = (ns + 1.0) * jnp.power(
                    jnp.maximum(abs_hz, 1e-12), ns) / (
                    2.0 * jnp.pi * 4.0 * idh)
                pdf_h_rev = jnp.where(i_dot_h > 0.0, pdf_h_rev, 0.0)
                is_gl = kind == float(MAT_GLOSSY)
                a_term = jnp.where(is_gl, 0.5 * INV_PI, a_term)
                b_term = jnp.where(is_gl, 0.5 * ct, b_term)
                pdf_dir = jnp.where(is_gl, 0.5 * (pdf_h + pdf_cos_dir),
                                    pdf_dir)
                pdf_rev = jnp.where(is_gl, 0.5 * (pdf_h_rev + pdf_cos_rev),
                                    pdf_rev)

            if has_phong:
                # (ns+2)/2pi ks cos^ns about the mirror direction; the
                # power-cosine pdf is symmetric in (lo, li)
                # (materials.py _phong_eval/_phong_pdf).
                cos_ro = jnp.clip(
                    -li_x * lox - li_y * loy + li_z * loz, 0.0, 1.0)
                powc = jnp.power(cos_ro, ns)
                is_ph = kind == float(MAT_PHONG)
                a_term = jnp.where(is_ph, 0.0, a_term)
                b_term = jnp.where(is_ph, (ns + 2.0) / (2.0 * jnp.pi) * powc,
                                   b_term)
                pdf_ph = (ns + 1.0) / (2.0 * jnp.pi) * powc
                pdf_dir = jnp.where(is_ph, pdf_ph, pdf_dir)
                pdf_rev = jnp.where(is_ph, pdf_ph, pdf_rev)

            if has_oren:
                # Oren-Nayar rough diffuse; sigma (degrees) rides in ns
                # (materials.py _oren_nayar_eval).
                sigma = ns * (jnp.pi / 180.0)
                s2 = sigma * sigma
                a_on = 1.0 - s2 / (2.0 * (s2 + 0.33))
                b_on = 0.45 * s2 / (s2 + 0.09)
                st_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - li_z * li_z))
                st_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - loz * loz))
                denom = jnp.maximum(st_i * st_o, 1e-6)
                cos_dphi = (li_x * lox + li_y * loy) / denom
                max_cos = jnp.where((st_i > 1e-4) & (st_o > 1e-4),
                                    jnp.maximum(cos_dphi, 0.0), 0.0)
                big_i = abs_liz > abs_loz
                sin_alpha = jnp.where(big_i, st_o, st_i)
                tan_beta = jnp.where(
                    big_i,
                    st_i / jnp.maximum(abs_liz, 1e-6),
                    st_o / jnp.maximum(abs_loz, 1e-6),
                )
                is_on = kind == float(MAT_OREN_NAYAR)
                a_term = jnp.where(
                    is_on,
                    INV_PI * (a_on + b_on * max_cos * sin_alpha * tan_beta),
                    a_term,
                )
                pdf_dir = jnp.where(is_on, pdf_cos_dir, pdf_dir)
                pdf_rev = jnp.where(is_on, pdf_cos_rev, pdf_rev)

            fx = kdx * a_term + ksx * b_term
            fy = kdy * a_term + ksy * b_term
            fz = kdz * a_term + ksz * b_term
            ok = ok & (pdf_dir > 0.0) & (pdf_rev > 0.0) & (
                (fx != 0.0) | (fy != 0.0) | (fz != 0.0))

            # Partial MIS weights + Epanechnikov kernel (vcm.cpp:571-611).
            if ppm:
                w = jnp.ones_like(d2)
            else:
                w_light = p_dvcm * eta_vc + p_dvm * pdf_dir
                w_cam = q_dvcm * eta_vc + q_dvm * pdf_rev
                w = 1.0 / (w_light + 1.0 + w_cam)
            epan = jnp.maximum(1.0 - d2 * inv_r2, 0.0)
            wk = jnp.where(ok, w * epan, 0.0)

            acc_ref[:, 0:1] = acc_ref[:, 0:1] + jnp.sum(
                tpx * fx * wk, axis=1, keepdims=True)
            acc_ref[:, 1:2] = acc_ref[:, 1:2] + jnp.sum(
                tpy * fy * wk, axis=1, keepdims=True)
            acc_ref[:, 2:3] = acc_ref[:, 2:3] + jnp.sum(
                tpz * fz * wk, axis=1, keepdims=True)

        # Four neighbour-cell combos, each a contiguous tile span, walked
        # as ONE fori over the concatenated spans: one loop setup instead
        # of four, and the double-buffered DMA pipelines ACROSS combo
        # boundaries (the per-block-combo floor was ~10 us x 4096 at
        # BLKQ=256 — r5_merge_split2).  Iteration order is identical to
        # the old per-combo loops (combo 0 tiles, then 1, 2, 3, each in
        # ascending tile order), so accumulation stays bitwise.
        t0_0 = spans_ref[0, 0, 0]
        t0_1 = spans_ref[0, 0, 1]
        t0_2 = spans_ref[0, 0, 2]
        t0_3 = spans_ref[0, 0, 3]
        nt0 = spans_ref[0, 0, 4]
        nt1 = spans_ref[0, 0, 5]
        nt2 = spans_ref[0, 0, 6]
        nt3 = spans_ref[0, 0, 7]
        o1 = nt0
        o2 = o1 + nt1
        o3 = o2 + nt2
        total = o3 + nt3

        def tile_for(k):
            return jnp.where(
                k >= o3, t0_3 + (k - o3),
                jnp.where(k >= o2, t0_2 + (k - o2),
                          jnp.where(k >= o1, t0_1 + (k - o1), t0_0 + k)))

        qk0, qk1, qk2, qk3 = col(29), col(30), col(31), col(32)

        @pl.when(total > 0)
        def _():
            tile_dma(tile_for(0), 0).start()

        def body(k, _):
            slot = jax.lax.rem(k, 2)
            tile_dma(tile_for(k), slot).wait()

            @pl.when(k + 1 < total)
            def _():
                tile_dma(tile_for(k + 1), 1 - slot).start()

            if union:
                qk = qk0  # unused: process matches all 4 combo keys
            else:
                qk = jnp.where(
                    k >= o3, qk3,
                    jnp.where(k >= o2, qk2, jnp.where(k >= o1, qk1, qk0)))
            process(slot, qk)
            return 0

        jax.lax.fori_loop(0, total, body, 0)

        out_ref[:, :] = acc_ref[:, :]

    return kernel


def _merge_call(qrec, spans, scal, tiles, kinds: tuple, ppm: bool,
                union: bool):
    num_q = qrec.shape[0]
    num_b = num_q // BLKQ
    return pl.pallas_call(
        _make_kernel(kinds, ppm, union),
        out_shape=jax.ShapeDtypeStruct((num_q, 8), jnp.float32),
        grid=(num_b,),
        in_specs=[
            pl.BlockSpec((BLKQ, QREC_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BLKQ, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLKQ, 8), jnp.float32),
            pltpu.VMEM((2, PREC_ROWS, PT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=INTERPRET,
    )(qrec, spans, scal, tiles)


# --------------------------------------------------------------------------
# XLA-side query prep
# --------------------------------------------------------------------------

def merge_contrib(grid: MergeGrid, qpos, normal, gn, w_out, params,
                  d_vcm, d_vm, active, mis_eta_vc, *, kinds: tuple,
                  ppm: bool):
    """Per-query merged photon contribution (R, 3) — the caller applies
    throughput and the 2/(pi r^2 n_paths) normalisation.

    Exact unbounded equivalent of hashgrid.cell_windows +
    vcm._vertex_merging's windowed accumulation."""
    from ..core.sampling import local_coordinates

    num_r = qpos.shape[0]

    # 2x2x2 anchor and the 4 (dx, dy) combo keys; z rides as key + 1.
    cellf = (qpos - grid.bbox_min) * grid.inv_cell
    m = jnp.floor(cellf - 0.5).astype(jnp.int32)
    a0 = jnp.clip(m, 0, GRID - 1)
    a1 = jnp.clip(m + 1, 0, GRID - 1)
    x0, y0, z0 = a0[:, 0], a0[:, 1], a0[:, 2]
    x1, y1 = a1[:, 0], a1[:, 1]
    k00 = (x0 * GRID + y0) * GRID + z0
    k01 = (x0 * GRID + y1) * GRID + z0
    k10 = (x1 * GRID + y0) * GRID + z0
    k11 = (x1 * GRID + y1) * GRID + z0
    # Clamp dedup: combos that collapsed onto an earlier combo's cell
    # must not double count.
    same_x = x1 == x0
    same_y = y1 == y0
    inval = jnp.int32(-2)
    k01 = jnp.where(same_y, inval, k01)
    k10 = jnp.where(same_x, inval, k10)
    k11 = jnp.where(same_x | same_y, inval, k11)
    combo_keys = [k00, k01, k10, k11]
    combo_keys = [jnp.where(active, k, inval) for k in combo_keys]

    # Sort queries by anchor key so blocks cover contiguous photon runs.
    # inv_perm via scatter, not a second sort (perm is a permutation).
    sort_key = jnp.where(active, k00, jnp.int32(1 << 30))
    iota = jnp.arange(num_r, dtype=jnp.int32)
    _, perm = jax.lax.sort((sort_key, iota), num_keys=1)
    inv_perm = jnp.zeros_like(iota).at[perm].set(iota, unique_indices=True)

    t, b = local_coordinates(normal)
    lo = jnp.stack(
        [jnp.sum(w_out * t, axis=-1), jnp.sum(w_out * b, axis=-1),
         jnp.sum(w_out * normal, axis=-1)], axis=-1)
    qrec = jnp.concatenate(
        [
            qpos, t, b, normal, gn, lo,
            jnp.sum(w_out * gn, axis=-1)[:, None],
            d_vcm[:, None], d_vm[:, None],
            params["kind"].astype(jnp.float32)[:, None],
            params["kd"], params["ks"], params["ns"][:, None],
            jnp.stack([k.astype(jnp.float32) for k in combo_keys], axis=1),
            active.astype(jnp.float32)[:, None],
            jnp.zeros((num_r, QREC_W - 34), jnp.float32),
        ],
        axis=1,
    )
    qrec_s = qrec[perm]
    ck_s = jnp.stack(combo_keys, axis=1)[perm]          # (R, 4) i32

    pad = (-num_r) % BLKQ
    if pad:
        prow = jnp.zeros((pad, QREC_W), jnp.float32)
        prow = prow.at[:, 29:33].set(-2.0)
        qrec_s = jnp.concatenate([qrec_s, prow], axis=0)
        ck_s = jnp.concatenate(
            [ck_s, jnp.full((pad, 4), inval, jnp.int32)], axis=0)

    num_b = qrec_s.shape[0] // BLKQ
    ck_blk = ck_s.reshape(num_b, BLKQ, 4)
    valid_k = ck_blk >= 0
    lo_k = jnp.min(jnp.where(valid_k, ck_blk, jnp.int32(1 << 30)), axis=1)
    hi_k = jnp.max(jnp.where(valid_k, ck_blk, jnp.int32(-1)), axis=1) + 1
    # ONE sort-method searchsorted for both bounds.  The default scan
    # method lowers to ~18 dependent dynamic gathers per call — measured
    # near-serial on this chip (the bulk of a 33 ms prep,
    # r5_merge_split2); method="sort" is one fused sort.  Integer keys
    # make side="right" on hi_k equal to side="left" on hi_k + 1.
    bounds = jnp.concatenate(
        [lo_k.reshape(-1), hi_k.reshape(-1) + 1])
    se = jnp.searchsorted(grid.keys, bounds, side="left",
                          method="sort").astype(jnp.int32)
    start = se[: num_b * 4].reshape(num_b, 4)
    end = se[num_b * 4 :].reshape(num_b, 4)
    t0 = start // PT
    nt = jnp.where(end > start, (end - 1) // PT - t0 + 1, 0)
    if _use_union():
        # Merge the 4 combo tile intervals into disjoint union intervals
        # (the spans overlap ~49% at production scale — "dedup-steps",
        # results/r5_qrow_split.txt); the union kernel visits each tile
        # once and pair-tests all 4 combo keys.  Static 4-way interval
        # merge: sort by start, sweep, emit on gaps.
        sent = jnp.int32(1 << 28)                    # > any tile index
        s_ = jnp.where(nt > 0, t0, sent)
        e_ = jnp.where(nt > 0, t0 + nt, sent)
        order = jnp.argsort(s_, axis=1)
        ss = jnp.take_along_axis(s_, order, axis=1)
        ee = jnp.take_along_axis(e_, order, axis=1)
        out_s, out_e = [], []
        cur_s, cur_e = ss[:, 0], ee[:, 0]
        for c in range(1, 4):
            nxt_s, nxt_e = ss[:, c], ee[:, c]
            join = nxt_s <= cur_e                    # overlap or adjoin
            out_s.append(jnp.where(join, sent, cur_s))
            out_e.append(jnp.where(join, sent, cur_e))
            cur_s = jnp.where(join, cur_s, nxt_s)
            cur_e = jnp.where(join, jnp.maximum(cur_e, nxt_e), nxt_e)
        out_s.append(cur_s)
        out_e.append(cur_e)
        t0 = jnp.stack(out_s, axis=1)
        nt = jnp.stack(out_e, axis=1) - t0
        nt = jnp.where((t0 >= sent) | (nt <= 0), 0, nt)
        t0 = jnp.where(nt > 0, t0, 0)
    spans = jnp.concatenate(
        [t0, nt], axis=1).astype(jnp.int32).reshape(num_b, 1, 8)

    scal = jnp.stack(
        [grid.radius_sqr, jnp.asarray(mis_eta_vc, jnp.float32)]
    ).reshape(1, 1, 2)

    out = _merge_call(qrec_s, spans, scal, grid.tiles, kinds, ppm,
                      _use_union())
    return out[inv_perm, 0:3]
