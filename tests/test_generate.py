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


def test_sampling_options():
    """generate() sampling: temperature=0 stays greedy (unchanged
    defaults); temperature>0 with key is reproducible; top_k=1 == greedy;
    top_p truncation produces valid tokens; prefill and no-prefill agree
    given the same key when sampling deterministically (top_k=1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ternary_spgemm_tpu.models import BitTransformerConfig, BitTransformerLM
    from ternary_spgemm_tpu.models.generate import _make_sampler, generate

    cfg = BitTransformerConfig(vocab=32, d_model=16, n_heads=2, d_ff=32,
                               n_layers=1)
    model = BitTransformerLM(cfg)
    params = model.init(jax.random.key(0))
    prompt = jax.random.randint(jax.random.key(1), (2, 4), 0, cfg.vocab)

    greedy = np.asarray(generate(model, prompt, 5, params=params))
    k1 = np.asarray(generate(model, prompt, 5, params=params,
                             temperature=0.7, top_k=1,
                             key=jax.random.key(7)))
    np.testing.assert_array_equal(k1, greedy)   # top_k=1 == argmax

    s1 = np.asarray(generate(model, prompt, 5, params=params,
                             temperature=1.0, key=jax.random.key(3)))
    s2 = np.asarray(generate(model, prompt, 5, params=params,
                             temperature=1.0, key=jax.random.key(3)))
    np.testing.assert_array_equal(s1, s2)       # reproducible given key
    sp = np.asarray(generate(model, prompt, 5, params=params,
                             temperature=1.0, top_p=0.9,
                             key=jax.random.key(4)))
    assert sp.shape == (2, 9) and (0 <= sp).all() and (sp < cfg.vocab).all()

    # the sampler's truncations: top_p keeps at least the argmax
    sampler = _make_sampler(1.0, 0, 0.5)
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.05, 0.05]]))
    for i in range(5):
        t = int(sampler(jax.random.key(i), logits)[0])
        assert t == 0                            # 0.6 >= 0.5 nucleus alone
    sampler_k = _make_sampler(1.0, 2, 1.0)
    for i in range(8):
        t = int(sampler_k(jax.random.key(i), logits)[0])
        assert t in (0, 1)
