"""Depth-capped cache admission via collect-then-select
(light_cache.select_shallowest): the vertex set kept under a binding
capacity must be independent of the light-band schedule — the property
plain append-order truncation broke (and with it the multi-chip bitwise
guarantee) when the capacity default tightened to 2x lpc."""

import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.render.integrators import vcm as vcm_mod
from imbatracer_tpu.render.light_cache import select_shallowest


def _collect(scene, cam, lpc, max_len, band):
    collect_cap = lpc * (max_len - 1)
    cache = vcm_mod.empty_cache(collect_cap)
    pm = jnp.float32(0.05)
    from imbatracer_tpu.core.sampling import PI

    eta = PI * 0.05 * 0.05 * lpc
    for start in range(0, lpc, band):
        bp = min(band, lpc - start)
        _, cache = vcm_mod._light_pass(
            scene, cam, jnp.uint32(0), pm, pm,
            vcm_mod.mis_pow(1.0 / eta), vcm_mod.mis_pow(eta),
            algo="vcm", num_pixels=cam.width * cam.height,
            light_path_count=lpc, max_len=max_len,
            cache_capacity=collect_cap, has_masks=False, has_bump=False,
            alpha_fn=None, path_start=jnp.int32(start),
            band_paths=bp, cache_in=cache, admit_cap=0)
    return cache


def test_single_band_truncation_equals_selection():
    """The license for the single-band fast path (render_vcm_frame):
    append-order truncation on ONE light band keeps bitwise the same
    canonical set select_shallowest does — its append order is
    (bounce, lane) = the selection key."""
    from imbatracer_tpu.render.camera import make_camera
    from imbatracer_tpu.render.light_cache import canonicalize
    from imbatracer_tpu.scene.procedural import make_cornell_scene

    scene, meta = make_cornell_scene()
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up, 16, 16, 60.0)
    lpc, max_len = 256, 6
    cap = vcm_mod.auto_cache_capacity(lpc, max_len)

    def light(capacity):
        cache = vcm_mod.empty_cache(capacity)
        pm = jnp.float32(0.05)
        from imbatracer_tpu.core.sampling import PI

        eta = PI * 0.05 * 0.05 * lpc
        _, cache = vcm_mod._light_pass(
            scene, cam, jnp.uint32(0), pm, pm,
            vcm_mod.mis_pow(1.0 / eta), vcm_mod.mis_pow(eta),
            algo="vcm", num_pixels=256, light_path_count=lpc,
            max_len=max_len, cache_capacity=capacity, has_masks=False,
            has_bump=False, alpha_fn=None, path_start=jnp.int32(0),
            band_paths=lpc, cache_in=cache, admit_cap=0)
        return cache

    old = canonicalize(light(cap))
    new = select_shallowest(light(lpc * (max_len - 1)), cap)
    n = int(old.count)
    assert n == int(new.count) == cap
    np.testing.assert_array_equal(np.asarray(old.path_id[:n]),
                                  np.asarray(new.path_id[:n]))
    np.testing.assert_array_equal(np.asarray(old.path_length[:n]),
                                  np.asarray(new.path_length[:n]))
    np.testing.assert_allclose(np.asarray(old.pos[:n]),
                               np.asarray(new.pos[:n]), rtol=0, atol=0)


def test_selection_is_band_invariant():
    from imbatracer_tpu.render.camera import make_camera
    from imbatracer_tpu.scene.procedural import make_cornell_scene

    scene, meta = make_cornell_scene()
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up, 16, 16, 60.0)
    lpc, max_len = 256, 6
    cap = vcm_mod.auto_cache_capacity(lpc, max_len)
    assert cap < lpc * (max_len - 1)  # the cap genuinely binds

    full_a = _collect(scene, cam, lpc, max_len, band=256)
    full_b = _collect(scene, cam, lpc, max_len, band=64)
    total = int(full_a.count)
    assert total == int(full_b.count) > cap  # selection genuinely binds

    a = select_shallowest(full_a, cap)
    b = select_shallowest(full_b, cap)
    n = int(a.count)
    assert n == int(b.count) == cap
    np.testing.assert_array_equal(np.asarray(a.path_id[:n]),
                                  np.asarray(b.path_id[:n]))
    np.testing.assert_array_equal(np.asarray(a.path_length[:n]),
                                  np.asarray(b.path_length[:n]))
    np.testing.assert_allclose(np.asarray(a.pos[:n]), np.asarray(b.pos[:n]),
                               rtol=0, atol=0)
    # Shallowest-first: every dropped vertex is at least as deep as any
    # kept one.
    kept_max = int(np.asarray(a.path_length[:n]).max())
    full = select_shallowest(full_a, lpc * (max_len - 1))
    dropped = np.asarray(full.path_length[: int(full.count)])
    kept_set = set(zip(np.asarray(a.path_id[:n]).tolist(),
                       np.asarray(a.path_length[:n]).tolist()))
    all_set = set(zip(np.asarray(full.path_id[: int(full.count)]).tolist(),
                      dropped.tolist()))
    drop_lengths = [pl for (pid, pl) in (all_set - kept_set)]
    assert min(drop_lengths) >= kept_max
