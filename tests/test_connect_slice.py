"""Locality-sliced connection sampling (IMBA_VCM_CONNECT_SLICE) is
estimator-neutral: sampling j = (s + u) mod count from one shared random
window has the same uniform per-lane marginal as the reference's
whole-cache uniform choice (vcm.cpp:494-496), so mean radiance must agree.

The knob is read at trace time, so the test monkeypatches
vcm._connect_slice_rows and uses statics unique to this test (lpc=384,
24x24) to guarantee fresh traces for both modes in one process.
"""

import jax.numpy as jnp
import numpy as np

import imbatracer_tpu.render.integrators.vcm as vcm
from imbatracer_tpu.frontend.engine import make_frame_fn
from imbatracer_tpu.frontend.renderer import RenderSettings
from imbatracer_tpu.scene.procedural import make_cornell_scene


def _mean_radiance(scene, meta, num_connections, frames=16):
    settings = RenderSettings(width=24, height=24, spp=1, algorithm="bpt",
                              max_path_len=4, light_path_count=384,
                              num_connections=num_connections)
    fn, _ = make_frame_fn(scene, meta, settings)
    acc = np.zeros(3, np.float64)
    for i in range(frames):
        acc += np.asarray(fn(jnp.uint32(i)), np.float64).mean(0)
    return acc / frames


def test_sliced_connect_matches_uniform(monkeypatch):
    scene, meta = make_cornell_scene()
    # num_connections differs between the modes purely to force a fresh
    # trace (vc_weight normalises by it, so the expectation is invariant).
    monkeypatch.setattr(vcm, "_connect_slice_rows", lambda: 0)
    uniform = _mean_radiance(scene, meta, num_connections=1)
    monkeypatch.setattr(vcm, "_connect_slice_rows", lambda: 128)
    sliced = _mean_radiance(scene, meta, num_connections=2)
    rel = np.abs(uniform - sliced) / (np.abs(uniform) + 1e-9)
    assert (uniform > 0).all()
    assert (rel < 0.08).all(), (uniform, sliced, rel)
