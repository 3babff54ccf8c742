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


def test_desc_descriptor_gather_matches_materialized():
    """extend_choose_desc_jit (device gathers Q/T from HBM-resident
    reads + packed genome, word-granular with the descending-window
    flip) must equal extend_choose_jit on host-materialized tiles for
    both directions, strands, and reads containing N."""
    import numpy as np
    import jax.numpy as jnp

    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.device import DeviceFMIndex
    from bwamem_tpu.index.format import Annotation
    from bwamem_tpu.ops.extend import (ExtendParams, extend_choose_jit,
                                       extend_choose_desc_jit,
                                       make_score_matrix)

    rng = np.random.default_rng(77)
    G, L, B = 50_000, 128, 64
    g = rng.integers(0, 4, G, dtype=np.uint8)
    ann = Annotation(names=["c"], lengths=[G], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    fm = DeviceFMIndex.from_host(idx)
    reads = np.stack([g[p:p + L] for p in rng.integers(0, G - L, B)])
    reads = reads.astype(np.int8)
    reads[3, 40:43] = 4  # N run inside a read
    N, QMAX, TMAX = 128, 96, 160
    jr = rng.integers(0, B, N).astype(np.int32)
    jdir = np.where(rng.random(N) < 0.5, 1, -1).astype(np.int8)
    ql = rng.integers(10, 90, N).astype(np.int32)
    jqs = np.where(jdir > 0,
                   rng.integers(0, 30, N),
                   rng.integers(95, L - 1, N)).astype(np.int32)
    tl = (ql + rng.integers(0, 60, N)).astype(np.int32)
    # doubled coords spanning both strands; keep windows in range
    jts = rng.integers(TMAX + 2, 2 * G - TMAX - 2, N).astype(np.int64)
    h0 = rng.integers(15, 40, N).astype(np.int32)
    mat = jnp.asarray(make_score_matrix(1, 4))
    params = ExtendParams()

    # host-materialized truth
    from bwamem_tpu.ops.refgather import gather_bases
    reads_j = jnp.asarray(reads)
    Q = np.full((N, QMAX), 4, np.int8)
    T = np.full((N, TMAX), 4, np.int8)
    for i in range(N):
        for x in range(ql[i]):
            q = jqs[i] + int(jdir[i]) * x
            Q[i, x] = reads[jr[i], q] if 0 <= q < L else 4
        tp = jts[i] + int(jdir[i]) * np.arange(tl[i], dtype=np.int64)
        T[i, :tl[i]] = np.asarray(
            gather_bases(fm, jnp.asarray(tp)), np.int8)
    want = np.asarray(extend_choose_jit(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(ql), jnp.asarray(tl),
        jnp.asarray(h0), mat, params, 5))
    got = np.asarray(extend_choose_desc_jit(
        fm, reads_j, jnp.asarray(jr), jnp.asarray(jqs), jnp.asarray(ql),
        jnp.asarray(jts), jnp.asarray(tl), jnp.asarray(jdir),
        jnp.asarray(h0), mat, params, 5, QMAX, TMAX))
    np.testing.assert_array_equal(got, want)
