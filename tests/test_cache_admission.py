"""Per-path cache admission (vcm._per_path_cap): the vertex set kept
under an overflowing cache must be independent of the light-band
schedule — the property append-order truncation broke (and with it the
multi-chip bitwise guarantee) when the capacity default tightened to
2x lpc."""

import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.render.integrators import vcm as vcm_mod
from imbatracer_tpu.render.light_cache import canonicalize


def _cache_sets(scene, cam, lpc, max_len, band_paths_list):
    """Run the light pass under different band splits; return the
    canonicalized (path_id, path_length) sets + packed records."""
    outs = []
    for band in band_paths_list:
        cap = vcm_mod.auto_cache_capacity(lpc, max_len)
        cache = vcm_mod.empty_cache(cap)
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
                cache_capacity=cap, has_masks=False, has_bump=False,
                alpha_fn=None, path_start=jnp.int32(start),
                band_paths=bp, cache_in=cache)
        cache = canonicalize(cache)
        outs.append(cache)
    return outs


def test_admission_is_band_invariant():
    from imbatracer_tpu.render.camera import make_camera
    from imbatracer_tpu.scene.procedural import make_cornell_scene

    scene, meta = make_cornell_scene()
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up, 16, 16, 60.0)
    lpc, max_len = 256, 6
    cap = vcm_mod.auto_cache_capacity(lpc, max_len)
    assert cap < lpc * (max_len - 1)  # the cap genuinely binds

    a, b = _cache_sets(scene, cam, lpc, max_len, [256, 64])
    assert int(a.count) == int(b.count)
    assert int(a.count) > 0
    n = int(a.count)
    np.testing.assert_array_equal(np.asarray(a.path_id[:n]),
                                  np.asarray(b.path_id[:n]))
    np.testing.assert_array_equal(np.asarray(a.path_length[:n]),
                                  np.asarray(b.path_length[:n]))
    np.testing.assert_allclose(np.asarray(a.pos[:n]), np.asarray(b.pos[:n]),
                               rtol=0, atol=0)
    # And the cap held: no path stored more than capacity // lpc.
    ids, counts = np.unique(np.asarray(a.path_id[:n]), return_counts=True)
    assert counts.max() <= cap // lpc
