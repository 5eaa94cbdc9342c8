"""Multi-chip SPMD rendering via shard_map over a device mesh.

The reference's parallelism is host threads over image tiles
(reference: render/scheduling/tile_scheduler.h:69-78) plus a GPU offload
per queue.  The TPU equivalent (SURVEY.md §5): shard the *ray batch*
across chips over ICI — the scene is replicated in HBM on every chip
(it is read-only), each chip traces its ray shard fully on-device, splats
a partial film, and a single `psum` over the mesh reduces films.  No other
communication exists in the whole frame: this is embarrassingly parallel
modulo one collective, which is exactly why the wavefront design scales.

Light passes (VCM/BPT/PPM) shard the same way over light paths; the
vertex cache is all-gathered before the camera pass (small: compact
records), matching SURVEY.md §5's plan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..render.camera import Camera
from ..render.film import splat
from ..render.integrators.pt import camera_rays, trace_paths
from ..render.light_cache import LightVertexCache, empty_cache

RAY_AXIS = "rays"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, (RAY_AXIS,))


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_len", "has_masks",
                     "has_bump", "mesh", "max_steps", "with_stats",
                     "band_pixels"),
)
def _pt_band_sharded(
    scene, cam, frame, start_pixel, *, width, height, spp, max_len,
    has_masks, has_bump, mesh, max_steps, with_stats, band_pixels,
):
    """One sharded PT pixel band: rays for [start, start+n_dev*band) are
    generated replicated, sharded over the mesh, traced, splatted per
    shard, and psum-reduced."""
    num_pixels = width * height
    org, d, state, pixel_id = camera_rays(
        cam, width, height, spp, frame, start_pixel=start_pixel,
        count=band_pixels * mesh.devices.size,
    )

    def shard_fn(scene, cam, org, d, state, pixel_id):
        out = trace_paths(
            scene, org, d, state, max_len, has_masks=has_masks,
            has_bump=has_bump, max_steps=max_steps, with_stats=with_stats,
        )
        radiance, n_rays = out if with_stats else (out, None)
        film = jax.lax.psum(splat(radiance, pixel_id, num_pixels), RAY_AXIS)
        if with_stats:
            return film, jax.lax.psum(n_rays, RAY_AXIS)
        return film

    out_specs = (P(), P()) if with_stats else P()
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=out_specs,
    )(scene, cam, org, d, state, pixel_id)


def render_pt_frame_sharded(
    scene,
    cam: Camera,
    frame: jnp.ndarray,
    width: int,
    height: int,
    mesh: Mesh,
    spp: int = 1,
    max_len: int = 10,
    has_masks: bool = False,
    has_bump: bool = False,
    max_steps: int = 0,
    with_stats: bool = False,
):
    """Data-parallel PT frame over `mesh`; returns the full (H*W, 3) film
    (replicated).  Bit-identical to the single-chip renderer (RNG is keyed
    by global pixel id; the film reduction is a per-pixel sum over
    disjoint ray shards)."""
    num_pixels = width * height
    n_dev = mesh.devices.size
    frame = jnp.asarray(frame, jnp.uint32)
    # Per-device dispatch cap, same rationale as the single-chip bands.
    band = min((1 << 18) // max(spp, 1), max(num_pixels // n_dev, 1))
    film = jnp.zeros((num_pixels, 3), jnp.float32)
    stats = jnp.zeros((), jnp.int32)
    # Sharded bands cover exactly bp * n_dev pixels each; the final
    # < n_dev remainder is rendered un-sharded below, so every pixel is
    # rendered exactly once for ANY resolution (no divisibility clamp —
    # the old `max(remainder // n_dev, 1)` could under- or over-cover).
    start = 0
    while num_pixels - start >= n_dev:
        bp = min(band, (num_pixels - start) // n_dev)
        out = _pt_band_sharded(
            scene, cam, frame, jnp.int32(start), width=width, height=height,
            spp=spp, max_len=max_len, has_masks=has_masks, has_bump=has_bump,
            mesh=mesh, max_steps=max_steps, with_stats=with_stats,
            band_pixels=bp,
        )
        if with_stats:
            part, n = out
            film = film + part
            stats = stats + n
        else:
            film = film + out
        start += bp * n_dev
    if start < num_pixels:
        from ..render.integrators.pt import _pt_band

        tail = num_pixels - start
        out = _pt_band(
            scene, cam, frame, jnp.int32(start), width=width, height=height,
            spp=spp, max_len=max_len, has_masks=has_masks, has_bump=has_bump,
            with_stats=with_stats, max_steps=max_steps, band_pixels=tail,
        )
        part = out[0] if with_stats else out
        film = film.at[start : start + tail].add(part)
        if with_stats:
            stats = stats + out[1]
    if with_stats:
        return film, stats
    return film


# ======================================================================
#  VCM-family multi-chip rendering
# ======================================================================
#
# SURVEY.md §5 plan: shard light paths over the mesh, merge the (compact)
# vertex caches, replicate the merged cache + hash grid, shard camera
# rays, psum/concat films.  The merge reproduces the single-chip banded
# append order exactly: per light-band iteration every shard starts from
# an empty local cache, and the merge scatters shard k's vertices at the
# global offset after shards 0..k-1 — i.e. shard-major order, which is
# the same as single-chip band order when the shard split equals the
# band split (it does: both are contiguous BAND-ray slices of the global
# path index space).  So on shapes where no local cache overflows, the
# merged cache — and therefore the whole frame — is bitwise identical to
# the single-chip renderer.  (Overflow drops can differ: each shard's
# local head-room is 2x its band rather than the global remainder.)
#
# Reference roles: tile_scheduler.h:69-78 (host-thread tiling) and
# light_vertices.h:59-127 (shared atomic cache) — here one all-gather-
# style merge per light band and one psum per film.


def _merge_cache(global_cache: LightVertexCache,
                 shard_cache: LightVertexCache,
                 n_dev: int) -> LightVertexCache:
    """Append shard-local caches ((n_dev*cap_l, ...), count (n_dev,))
    into the replicated global cache, in shard-major order."""
    cap_l = shard_cache.pos.shape[0] // n_dev
    cap = global_cache.capacity
    counts = shard_cache.count.astype(jnp.int32)          # (n_dev,)
    offs = jnp.cumsum(counts) - counts                     # exclusive
    li = jnp.arange(cap_l, dtype=jnp.int32)
    valid = li[None, :] < counts[:, None]                  # (n_dev, cap_l)
    tgt = jnp.where(
        valid, global_cache.count + offs[:, None] + li[None, :], cap
    ).reshape(-1)
    tgt = jnp.where(tgt >= cap, cap, tgt)                  # overflow drop

    def put(dst, src):
        return dst.at[tgt].set(src, mode="drop")

    new_count = jnp.minimum(global_cache.count + counts.sum(), cap)
    return LightVertexCache(
        pos=put(global_cache.pos, shard_cache.pos),
        w_out=put(global_cache.w_out, shard_cache.w_out),
        normal=put(global_cache.normal, shard_cache.normal),
        gn=put(global_cache.gn, shard_cache.gn),
        uv=put(global_cache.uv, shard_cache.uv),
        mat_id=put(global_cache.mat_id, shard_cache.mat_id),
        throughput=put(global_cache.throughput, shard_cache.throughput),
        d_vc=put(global_cache.d_vc, shard_cache.d_vc),
        d_vcm=put(global_cache.d_vcm, shard_cache.d_vcm),
        d_vm=put(global_cache.d_vm, shard_cache.d_vm),
        path_length=put(global_cache.path_length, shard_cache.path_length),
        path_id=put(global_cache.path_id, shard_cache.path_id),
        count=new_count,
    )


@partial(jax.jit, static_argnames=(
    "mesh", "algo", "num_pixels", "light_path_count", "max_len",
    "local_capacity", "has_masks", "has_bump", "max_steps", "techniques",
    "band_paths",
))
def _vcm_light_band_sharded(scene, cam, frame, base_radius, path_start, *,
                            mesh, algo, num_pixels, light_path_count,
                            max_len, local_capacity, has_masks, has_bump,
                            max_steps, techniques, band_paths):
    """One sharded light band: every device traces `band_paths` paths into
    an empty local cache.  Returns (film (psum'd, replicated), local
    caches with leading shard axis)."""
    from ..render.integrators.pt import alpha_fn_for
    from ..render.integrators.vcm import _light_pass, _mis_constants

    pm_radius, mis_eta_vc, mis_eta_vm = _mis_constants(
        frame, base_radius, light_path_count, algo
    )
    alpha_fn = alpha_fn_for(scene) if has_masks else None

    def shard_fn(scene, cam, frame, pm_radius, base_radius, eta_vc, eta_vm,
                 path_start):
        my_start = path_start + jax.lax.axis_index(RAY_AXIS) * band_paths
        film, cache = _light_pass(
            scene, cam, frame, pm_radius, base_radius, eta_vc, eta_vm,
            algo=algo, num_pixels=num_pixels,
            light_path_count=light_path_count, max_len=max_len,
            cache_capacity=local_capacity, has_masks=has_masks,
            has_bump=has_bump, alpha_fn=alpha_fn, max_steps=max_steps,
            techniques=techniques, path_start=my_start,
            band_paths=band_paths, cache_in=empty_cache(local_capacity),
        )
        film = jax.lax.psum(film, RAY_AXIS)
        return film, cache.replace(count=cache.count[None])

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(RAY_AXIS)),
    )(scene, cam, frame, pm_radius, base_radius, mis_eta_vc, mis_eta_vm,
      path_start)


@partial(jax.jit, static_argnames=(
    "mesh", "algo", "width", "height", "spp", "max_len", "light_path_count",
    "num_connections", "num_knn", "table_size", "max_per_cell", "has_masks",
    "has_bump", "max_steps", "techniques", "band_pixels", "mat_kinds",
))
def _vcm_camera_band_sharded(scene, cam, frame, cache, grid, base_radius,
                             start_pixel, *, mesh, algo, width, height, spp,
                             max_len, light_path_count, num_connections,
                             num_knn, table_size, max_per_cell, has_masks,
                             has_bump, max_steps, techniques, band_pixels,
                             mat_kinds=None):
    """One sharded camera band: each device renders `band_pixels` pixels
    with the replicated merged cache; films concatenate along the mesh."""
    from ..render.integrators.pt import alpha_fn_for
    from ..render.integrators.vcm import _camera_pass, _mis_constants

    pm_radius, mis_eta_vc, mis_eta_vm = _mis_constants(
        frame, base_radius, light_path_count, algo
    )
    alpha_fn = alpha_fn_for(scene) if has_masks else None

    def shard_fn(scene, cam, frame, cache, grid, pm_radius, base_radius,
                 eta_vc, eta_vm, start_pixel):
        my_start = start_pixel + jax.lax.axis_index(RAY_AXIS) * band_pixels
        return _camera_pass(
            scene, cam, frame, cache, grid, pm_radius, base_radius,
            eta_vc, eta_vm, algo=algo, width=width, height=height, spp=spp,
            max_len=max_len, light_path_count=light_path_count,
            num_connections=num_connections, num_knn=num_knn,
            table_size=table_size, max_per_cell=max_per_cell,
            has_masks=has_masks, has_bump=has_bump, alpha_fn=alpha_fn,
            max_steps=max_steps, techniques=techniques,
            start_pixel=my_start, band_pixels=band_pixels,
            mat_kinds=mat_kinds,
        )

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(),) * 10,
        out_specs=P(RAY_AXIS),
    )(scene, cam, frame, cache, grid, pm_radius, base_radius, mis_eta_vc,
      mis_eta_vm, start_pixel)


BAND_RAYS = 1 << 18  # per-device dispatch cap (see integrators.vcm)


def render_vcm_frame_sharded(
    scene,
    cam: Camera,
    frame,
    base_radius,
    mesh: Mesh,
    *,
    algo: str = "vcm",
    width: int = 512,
    height: int = 512,
    spp: int = 1,
    max_len: int = 10,
    light_path_count: int = 0,
    num_connections: int = 1,
    num_knn: int = 10,
    cache_capacity: int = 0,
    table_size: int = 0,
    max_per_cell: int = 4,
    has_masks: bool = False,
    has_bump: bool = False,
    max_steps: int = 0,
    techniques=None,
    merge_kernel: bool = None,
    mat_kinds: tuple = None,
):
    """Multi-chip VCM-family frame (drop-in for
    integrators.vcm.render_vcm_frame; see the module comment for the
    exactness contract)."""
    from ..render.integrators.vcm import (
        ALGOS, TECHNIQUES, _vcm_build_grid,
    )

    if techniques is None:
        techniques = TECHNIQUES
    assert algo in ALGOS
    if merge_kernel is None:
        merge_kernel = jax.default_backend() == "tpu"
    n_dev = mesh.devices.size
    frame = jnp.asarray(frame, jnp.uint32)
    base_radius = jnp.asarray(base_radius, jnp.float32)
    num_pixels = width * height
    if light_path_count <= 0:
        light_path_count = num_pixels // 2
    if cache_capacity <= 0:
        cache_capacity = 2 * light_path_count
    if table_size <= 0:
        table_size = 2 * cache_capacity

    film = jnp.zeros((num_pixels, 3), jnp.float32)
    cache = None
    grid = None

    if algo != "pt":
        # Light paths shard the ESTIMATOR's sample space: tracing more
        # (or fewer) paths than light_path_count biases the light-tracing
        # film, so the count must split exactly over the mesh.  The
        # engine/CLI round it up to a mesh multiple (engine.py); direct
        # callers must do the same.
        if light_path_count % n_dev != 0:
            raise ValueError(
                f"light_path_count ({light_path_count}) must be divisible "
                f"by the mesh size ({n_dev}); round it up as engine.py does"
            )
        # Per-device band, global stride n_dev * band: the shard split of
        # the path index space equals the single-chip band split.
        band = min(BAND_RAYS, light_path_count // n_dev)
        stride = band * n_dev
        cache = empty_cache(cache_capacity)
        for start in range(0, light_path_count, stride):
            # Remainders stay divisible by n_dev (count and stride both
            # are), so the tail band is exact.
            bp = min(band, (light_path_count - start) // n_dev)
            local_cap = max(2 * bp, 1024)
            light_film, shard_cache = _vcm_light_band_sharded(
                scene, cam, frame, base_radius, jnp.int32(start),
                mesh=mesh, algo=algo, num_pixels=num_pixels,
                light_path_count=light_path_count, max_len=max_len,
                local_capacity=local_cap, has_masks=has_masks,
                has_bump=has_bump, max_steps=max_steps,
                techniques=techniques, band_paths=bp,
            )
            film = film + light_film
            cache = _merge_cache(cache, shard_cache, n_dev)
        from ..render.light_cache import canonicalize

        cache = canonicalize(cache)
        if algo in ("vcm", "ppm"):
            grid = _vcm_build_grid(
                cache, frame, base_radius, table_size=table_size,
                cache_capacity=cache_capacity,
                light_path_count=light_path_count, algo=algo,
                use_kernel=merge_kernel,
            )

    if algo != "lt":
        band = min(BAND_RAYS // max(spp, 1),
                   max(num_pixels // n_dev, 1))
        parts = []
        # Sharded bands cover exactly bp * n_dev pixels; the final
        # < n_dev remainder renders un-sharded (single-device band), so
        # the concatenated parts cover every pixel exactly once for ANY
        # resolution.
        start = 0
        while num_pixels - start >= n_dev:
            bp = min(band, (num_pixels - start) // n_dev)
            parts.append(_vcm_camera_band_sharded(
                scene, cam, frame, cache, grid, base_radius,
                jnp.int32(start), mesh=mesh, algo=algo, width=width,
                height=height, spp=spp, max_len=max_len,
                light_path_count=light_path_count,
                num_connections=num_connections, num_knn=num_knn,
                table_size=table_size, max_per_cell=max_per_cell,
                has_masks=has_masks, has_bump=has_bump, max_steps=max_steps,
                techniques=techniques, band_pixels=bp, mat_kinds=mat_kinds,
            ))
            start += bp * n_dev
        if start < num_pixels:
            from ..render.integrators.vcm import _vcm_camera_band

            parts.append(_vcm_camera_band(
                scene, cam, frame, cache, grid, base_radius, algo=algo,
                width=width, height=height, spp=spp, max_len=max_len,
                light_path_count=light_path_count,
                num_connections=num_connections, num_knn=num_knn,
                table_size=table_size, max_per_cell=max_per_cell,
                has_masks=has_masks, has_bump=has_bump, max_steps=max_steps,
                techniques=techniques, start_pixel=jnp.int32(start),
                band_pixels=num_pixels - start, mat_kinds=mat_kinds,
            ))
        cam_film = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        film = film + cam_film
    return film
