"""Generator semantics tests (mirrors cpp_impl/sparseUtils.h:6-90 behavior)."""

import numpy as np
import pytest

from ternary_spgemm_tpu.formats import generate_ternary, generate_x


def test_values_are_ternary():
    W = generate_ternary(64, 128, 4, seed=0)
    assert W.shape == (64, 128)
    assert set(np.unique(W)).issubset({-1, 0, 1})


def test_seeded_determinism():
    a = generate_ternary(32, 64, 4, seed=7)
    b = generate_ternary(32, 64, 4, seed=7)
    c = generate_ternary(32, 64, 4, seed=8)
    assert (a == b).all()
    assert (a != c).any()


@pytest.mark.parametrize("s", [2, 4, 8, 16])
def test_row_nnz_matches_reference_semantics(s):
    # Per row: limitPos + limitNeg == 2*((N//s)//2) exactly, and the pos/neg
    # imbalance is bounded by N//s//20 + 1 (sparseUtils.h:56-61).
    K, N = 64, 1024
    W = generate_ternary(K, N, s, seed=3)
    pos = (W == 1).sum(axis=1)
    neg = (W == -1).sum(axis=1)
    expected_total = 2 * ((N // s) // 2)
    assert (pos + neg == expected_total).all()
    max_vari = N // s // 20 + 1
    assert (pos - neg <= 2 * max_vari).all()
    assert (pos - neg >= 0).all()


def test_uniform_mode_window_structure():
    s, K, N = 4, 16, 128
    W = generate_ternary(K, N, s, seed=5, uniform=True)
    win = 2 * s
    for k in range(K):
        for w0 in range(0, N, win):
            window = W[k, w0:w0 + win]
            assert (window == 1).sum() == 1
            assert (window == -1).sum() == 1


def test_generate_x_integer_valued():
    X = generate_x(8, 16, seed=0, value_range=512)
    assert X.dtype == np.float32
    assert (X == np.round(X)).all()
    assert X.max() <= 512 and X.min() >= -512
