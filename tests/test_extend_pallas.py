"""Pallas extension kernel vs the lax reference path (interpret mode on
CPU; on TPU the same kernel runs compiled)."""
import jax.numpy as jnp
import numpy as np
import pytest

from bwamem_tpu.ops.extend import ExtendParams, extend_batch, make_score_matrix
from bwamem_tpu.ops.pallas.extend_kernel import extend_batch_pallas
from tests.test_extend import _random_cases


@pytest.mark.parametrize("zdrop,opt_ext,w", [
    (0, False, 300),   # fork decoy configuration
    (0, True, 300),
    (100, True, 100),  # vanilla-like
])
def test_pallas_matches_lax(zdrop, opt_ext, w):
    rng = np.random.default_rng(1000 + zdrop + w)
    mat = make_score_matrix(1, 4)
    params = ExtendParams(o_del=6, e_del=1, o_ins=6, e_ins=1, w=w,
                          zdrop=zdrop, end_bonus=5, opt_ext=opt_ext,
                          max_mat=1, mismatch=4)
    cases = _random_cases(rng, 33, with_n=True)
    QMAX = max(len(q) for q, _, _ in cases)
    TMAX = max(len(t) for _, t, _ in cases)
    N = len(cases)
    Q = np.full((N, QMAX), 4, np.int32)
    T = np.full((N, TMAX), 4, np.int32)
    ql = np.zeros(N, np.int32)
    tl = np.zeros(N, np.int32)
    h0 = np.zeros(N, np.int32)
    for i, (q, t, h) in enumerate(cases):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
        ql[i], tl[i], h0[i] = len(q), len(t), h

    lax_out = extend_batch(jnp.asarray(Q), jnp.asarray(T), jnp.asarray(ql),
                           jnp.asarray(tl), jnp.asarray(h0),
                           jnp.asarray(mat), params)
    pal_out = extend_batch_pallas(jnp.asarray(Q), jnp.asarray(T),
                                  jnp.asarray(ql), jnp.asarray(tl),
                                  jnp.asarray(h0), params, tile=8,
                                  interpret=True)
    for k in ("score", "qle", "tle", "gscore", "gtle", "max_off"):
        np.testing.assert_array_equal(
            np.asarray(pal_out[k]), np.asarray(lax_out[k]), err_msg=k)


def test_bucketed_dispatch_matches_scan():
    """qlen-bucketed dual kernel dispatch (N >= 512, QMAX > 126)."""
    import jax.numpy as jnp
    from bwamem_tpu.ops.extend import ExtendParams, extend_batch, make_score_matrix
    from bwamem_tpu.ops.pallas.extend_kernel import extend_batch_pallas

    rng = np.random.default_rng(11)
    N, QMAX, TMAX = 512, 160, 64
    query = rng.integers(0, 4, (N, QMAX)).astype(np.int8)
    target = rng.integers(0, 4, (N, TMAX)).astype(np.int8)
    qlen = rng.integers(0, QMAX + 1, N).astype(np.int32)
    qlen[:10] = [0, 1, QMAX, 126, 127, 125, 128, 60, 200 % QMAX, 2]
    tlen = rng.integers(0, TMAX + 1, N).astype(np.int32)
    h0 = rng.integers(1, 100, N).astype(np.int32)
    params = ExtendParams()
    mat = jnp.asarray(make_score_matrix(1, 4))
    want = extend_batch(jnp.asarray(query), jnp.asarray(target),
                        jnp.asarray(qlen), jnp.asarray(tlen),
                        jnp.asarray(h0), mat, params)
    got = extend_batch_pallas(jnp.asarray(query), jnp.asarray(target),
                              jnp.asarray(qlen), jnp.asarray(tlen),
                              jnp.asarray(h0), params, interpret=True)
    for k in ("score", "qle", "tle", "gscore", "gtle"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
