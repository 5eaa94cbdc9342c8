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

RAY_AXIS = "rays"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, (RAY_AXIS,))


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_len", "has_masks", "has_bump", "mesh"),
)
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
):
    """Data-parallel PT frame over `mesh`; returns the full (H*W, 3) film
    (replicated)."""
    num_pixels = width * height
    n_dev = mesh.devices.size
    assert (num_pixels * spp) % n_dev == 0, "rays must divide the mesh"

    org, d, state, pixel_id = camera_rays(cam, width, height, spp, frame)

    def shard_fn(scene, cam, org, d, state, pixel_id):
        radiance = trace_paths(
            scene, org, d, state, max_len, has_masks=has_masks, has_bump=has_bump
        )
        film = splat(radiance, pixel_id, num_pixels)
        return jax.lax.psum(film, RAY_AXIS)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(),
    )(scene, cam, org, d, state, pixel_id)
