"""Bit-exactness of the gather-free row-fetch tiers (ops/take.py).

Every tier must reproduce the plain gather BIT-FOR-BIT for arbitrary
payloads — floats of all magnitudes, bitcast int32 columns, NaN/Inf —
so routing between them is a pure performance decision (the shading
record mixes floats with bitcast ids, surface.py::make_interaction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.ops.take import (take_rows_mxu, take_rows_mxu8,
                                     take_rows_select, take_rows_t)


def _table(T, K, seed):
    rng = np.random.default_rng(seed)
    tab = (rng.standard_normal((T, K)) *
           10.0 ** rng.integers(-20, 20, (T, K))).astype(np.float32)
    # Bitcast int columns (ids up to table sizes), plus specials.
    ints = rng.integers(-1, 1 << 22, (T, 2)).astype(np.int32)
    tab[:, :2] = ints.view(np.float32)
    tab[0, 2] = np.nan
    tab[min(1, T - 1), 3] = np.inf
    tab[:, 4] = rng.integers(0, 1 << 16, T).astype(np.float32)
    return tab


@pytest.mark.parametrize("T", [1, 3, 36, 130])
def test_tiers_bitwise_vs_gather(T):
    K, R = 8, 257
    tab = _table(T, K, seed=T)
    idx = np.random.default_rng(T + 1).integers(0, T, R).astype(np.int32)
    want = tab[idx].T

    got_sel = np.asarray(jax.jit(take_rows_select)(tab, idx))
    got_mxu = np.asarray(jax.jit(take_rows_mxu)(tab, idx))
    got_mx8 = np.asarray(jax.jit(take_rows_mxu8)(tab, idx))
    assert (got_sel.view(np.uint32) == want.view(np.uint32)).all()
    assert (got_mxu.view(np.uint32) == want.view(np.uint32)).all()
    assert (got_mx8.view(np.uint32) == want.view(np.uint32)).all()


def test_router_modes_agree():
    tab = _table(20, 6, seed=9)
    idx = np.arange(20, dtype=np.int32)[::-1]
    want = np.asarray(take_rows_t(tab, idx, mode="gather"))
    for mode in ("select", "mxu", "mxu8", "auto"):
        got = np.asarray(take_rows_t(tab, idx, mode=mode))
        assert (got.view(np.uint32) == want.view(np.uint32)).all(), mode
