"""Batched extension kernel vs the scalar ksw_extend oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from bwamem_tpu.ops.extend import (ExtendParams, end_choice, extend_batch,
                                   make_score_matrix)
from bwamem_tpu.oracle.ksw import ksw_extend


def _random_cases(rng, n, qmax=60, tmax=120, err=0.08, with_n=False):
    """(query, target) pairs where target is a mutated superstring."""
    cases = []
    for _ in range(n):
        qlen = int(rng.integers(10, qmax))
        tlen = int(rng.integers(qlen // 2, tmax))
        base = rng.integers(0, 4, max(qlen, tlen) + 10, dtype=np.int32)
        q = base[:qlen].copy()
        t = base[:tlen].copy()
        # mutate
        for arr in (q, t):
            for i in range(len(arr)):
                if rng.random() < err:
                    arr[i] = (arr[i] + 1 + rng.integers(0, 3)) % 4
        if with_n and qlen > 5:
            q[int(rng.integers(0, qlen))] = 4
        h0 = int(rng.integers(1, qlen + 1))
        cases.append((q, t, h0))
    return cases


@pytest.mark.parametrize("zdrop,opt_ext,w", [
    (0, True, 300),   # fork defaults
    (0, False, 300),
    (100, True, 100), # vanilla-bwa-like
    (0, True, 10),    # narrow band
])
def test_extend_matches_oracle(zdrop, opt_ext, w):
    rng = np.random.default_rng(42 + zdrop + w)
    mat = make_score_matrix(1, 4)
    params = ExtendParams(o_del=6, e_del=1, o_ins=6, e_ins=1, w=w,
                          zdrop=zdrop, end_bonus=5, opt_ext=opt_ext)
    cases = _random_cases(rng, 40, with_n=True)
    QMAX = max(len(q) for q, _, _ in cases)
    TMAX = max(len(t) for _, t, _ in cases)
    N = len(cases)
    Q = np.full((N, QMAX), 4, np.int32)
    T = np.full((N, TMAX), 4, np.int32)
    qlen = np.zeros(N, np.int32)
    tlen = np.zeros(N, np.int32)
    h0 = np.zeros(N, np.int32)
    for i, (q, t, h) in enumerate(cases):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
        qlen[i], tlen[i], h0[i] = len(q), len(t), h

    out = extend_batch(jnp.asarray(Q), jnp.asarray(T), jnp.asarray(qlen),
                       jnp.asarray(tlen), jnp.asarray(h0),
                       jnp.asarray(mat), params)
    out = {k: np.asarray(v) for k, v in out.items()}

    # Contract: the consumer sees the end_choice-selected triple (exactly
    # what decoy_cpu_align writes into host_res, src/bwamem.c:1887-1901).
    # Those must match the oracle 100%. Positive gscore/gtle must also
    # match exactly; gscore<=0 tie bookkeeping may differ (the reference's
    # zero-span end-shrink suppresses tie updates — downstream-invisible).
    for i, (q, t, h) in enumerate(cases):
        exp = ksw_extend(q, t, mat, 6, 1, 6, 1, w, 5, zdrop, h,
                         opt_ext=opt_ext)
        sg, qg, tg = (int(out["score"][i]), int(out["qle"][i]),
                      int(out["tle"][i]))
        gs, gt = int(out["gscore"][i]), int(out["gtle"][i])
        eff_got = (sg, qg, tg) if (gs <= 0 or gs <= sg - 5) \
            else (gs, len(q), gt)
        eff_exp = (exp.score, exp.qle, exp.tle) \
            if (exp.gscore <= 0 or exp.gscore <= exp.score - 5) \
            else (exp.gscore, len(q), exp.gtle)
        assert eff_got == eff_exp, f"case {i}: {eff_got} vs {eff_exp}"
        if exp.gscore > 0:
            assert (gs, gt) == (exp.gscore, exp.gtle), f"case {i}"
        else:
            assert gs <= 0, f"case {i}"
        assert (sg, qg, tg) == (exp.score, exp.qle, exp.tle), f"case {i}"


def test_end_choice_rule():
    # gscore <= 0 -> local; gscore <= score - pen -> local; else to-end
    s, q, t = end_choice(jnp.asarray([10, 10, 10]), jnp.asarray([5, 5, 5]),
                         jnp.asarray([6, 6, 6]), jnp.asarray([-1, 4, 9]),
                         jnp.asarray([7, 7, 7]), jnp.asarray([8, 8, 8]), 5)
    assert list(np.asarray(s)) == [10, 10, 9]
    assert list(np.asarray(q)) == [5, 5, 8]
    assert list(np.asarray(t)) == [6, 6, 7]
