"""Lattice descriptor invariants + golden constants vs the reference."""

import numpy as np

from lb2d_tpu.core.lattice import D2Q9, D2Q25


def _check_moments(lat):
    w = lat.w_np(np.float64)
    cx = lat.cx_np(np.float64)
    cy = lat.cy_np(np.float64)
    assert abs(w.sum() - 1.0) < 1e-12
    assert abs((w * cx).sum()) < 1e-12
    assert abs((w * cy).sum()) < 1e-12
    # second moment = cs^2 * I
    assert abs((w * cx * cx).sum() - lat.cs2) < 1e-12
    assert abs((w * cy * cy).sum() - lat.cs2) < 1e-12
    assert abs((w * cx * cy).sum()) < 1e-12


def test_d2q9_constants():
    # opencl_dim.py:22-26
    assert D2Q9.q == 9
    np.testing.assert_allclose(
        D2Q9.w_np(np.float64),
        [4 / 9] + [1 / 9] * 4 + [1 / 36] * 4,
    )
    assert D2Q9.cx == (0, 1, 0, -1, 0, 1, -1, -1, 1)
    assert D2Q9.cy == (0, 0, 1, 0, -1, 1, 1, -1, -1)
    assert abs(D2Q9.cs - 1 / np.sqrt(3)) < 1e-12
    _check_moments(D2Q9)


def test_d2q9_opposites():
    for j in range(9):
        k = D2Q9.opp[j]
        assert D2Q9.cx[k] == -D2Q9.cx[j]
        assert D2Q9.cy[k] == -D2Q9.cy[j]
    assert D2Q9.opp[0] == 0
    assert D2Q9.opp[1] == 3 and D2Q9.opp[5] == 7  # D2Q9.cl:423-430 pairing


def test_d2q25_constants():
    # multi.py:829-876
    assert D2Q25.q == 25
    assert abs(D2Q25.cs - np.sqrt(1 - np.sqrt(2 / 5))) < 1e-12
    r10 = np.sqrt(10.0)
    t0 = (4 / 45) * (4 + r10)
    t1 = (3 / 80) * (8 - r10)
    t3 = (1 / 720) * (16 - 5 * r10)
    assert abs(D2Q25.w[0] - t0 * t0) < 1e-14
    assert abs(D2Q25.w[1] - t0 * t1) < 1e-14
    assert abs(D2Q25.w[-1] - t3 * t3) < 1e-14
    assert set(D2Q25.cx) == {-3, -1, 0, 1, 3}
    _check_moments(D2Q25)
    for j in range(25):
        k = D2Q25.opp[j]
        assert D2Q25.cx[k] == -D2Q25.cx[j]
        assert D2Q25.cy[k] == -D2Q25.cy[j]
