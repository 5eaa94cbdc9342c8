"""Native (C++) BVH builder: validity + agreement with the NumPy builder."""

import numpy as np
import pytest

from imbatracer_tpu.accel.builder import build_bvh, triangle_bboxes, validate_bvh
from imbatracer_tpu.accel.native import build_bvh_native, get_lib


def _tris(n, seed=0):
    rs = np.random.RandomState(seed)
    base = (rs.rand(n, 3).astype(np.float32) - 0.5) * 10
    v0 = base + rs.randn(n, 3).astype(np.float32) * 0.5
    v1 = base + rs.randn(n, 3).astype(np.float32) * 0.5
    v2 = base + rs.randn(n, 3).astype(np.float32) * 0.5
    return v0, v1, v2


@pytest.mark.skipif(get_lib() is None, reason="native builder unavailable")
@pytest.mark.parametrize("n", [5, 1000, 20000])
def test_native_builder_valid(n):
    v0, v1, v2 = _tris(n, seed=n)
    lo, hi = triangle_bboxes(v0, v1, v2)
    nodes = build_bvh_native(lo, hi)
    assert nodes is not None
    validate_bvh(nodes, lo, hi)
    # All leaves within leaf size.
    leaf = nodes.right == -1
    assert nodes.count[leaf].max() <= 4


@pytest.mark.skipif(get_lib() is None, reason="native builder unavailable")
def test_native_builder_quality_close_to_numpy():
    """SAH total-surface cost of both builders should be comparable."""
    v0, v1, v2 = _tris(5000, seed=3)
    lo, hi = triangle_bboxes(v0, v1, v2)

    def sah_cost(nodes):
        leaf = nodes.right == -1
        d = np.maximum(nodes.bbox_max - nodes.bbox_min, 0)
        area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        return float((area * np.where(leaf, nodes.count, 1)).sum())

    c_native = sah_cost(build_bvh_native(lo, hi))
    c_numpy = sah_cost(build_bvh(lo, hi))
    assert c_native < c_numpy * 1.25, (c_native, c_numpy)
