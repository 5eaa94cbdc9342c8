"""Traversal-mode equivalence tests."""

import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.render.intersect import BIG
from imbatracer_tpu.render.traverse import any_hit, closest_hit

def test_dense_chunked_matches_loop():
    """Chunked-loop dense mode (mode "densel") vs the skip-link loop on
    a mid-size scene, closest + occlusion + active masks + non-chunk-
    multiple triangle counts."""
    import numpy as np
    from imbatracer_tpu.accel.device import DeviceBvh
    from imbatracer_tpu.render.traverse import _dense_chunked
    from imbatracer_tpu.scene.procedural import make_big_scene

    scene, _ = make_big_scene(num_boxes=150, seed=9)   # ~1.8k tris
    bvh = scene.bvh
    rs = np.random.RandomState(31)
    n = 2048
    org = jnp.asarray(np.stack(
        [rs.uniform(-30, 30, n), rs.uniform(1, 10, n),
         rs.uniform(-30, 30, n)], -1), jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    act = jnp.asarray(rs.rand(n) < 0.8)

    hx = closest_hit(bvh, org, d, 0.0, BIG, active=act)
    hd = _dense_chunked(bvh, org, d, 0.0, BIG, act, None, True)
    tp, tx = np.asarray(hd.t), np.asarray(hx.t)
    pid_d, pid_x = np.asarray(hd.prim_id), np.asarray(hx.prim_id)
    tie = (pid_d != pid_x) & (pid_d >= 0) & (pid_x >= 0) & (tp == tx)
    assert ((pid_d == pid_x) | tie).all()
    m = (pid_x >= 0) & ~tie
    np.testing.assert_allclose(tp[m], tx[m], rtol=1e-4)

    od = _dense_chunked(bvh, org, d, 0.0, jnp.full((n,), 8.0), act, None,
                        False)
    ox_ = any_hit(bvh, org, d, 0.0, jnp.full((n,), 8.0), active=act)
    np.testing.assert_array_equal(np.asarray(od), np.asarray(ox_))
