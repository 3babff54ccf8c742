"""Banded sliding-window extension kernel vs the lax twin.

The banded Pallas kernel (ops/pallas/extend_banded.py) must agree
EXACTLY with ops/extend.py extend_batch (the ksw_extend2 semantics
contract, reference src/ksw.c:864-988) on every output field — the lax
twin applies the band as masks over the dense row, the kernel slides a
window; any window-anchoring mistake shows up as a field diff here.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bwamem_tpu.ops.extend import (ExtendParams, extend_batch,  # noqa: E402
                                   make_score_matrix)
from bwamem_tpu.ops.pallas.extend_banded import \
    extend_batch_banded  # noqa: E402


def _mk(rng, n, qmax, tmax, sim=0.85):
    """Random extension jobs: target mutated from query so extensions
    walk a realistic distance before dying."""
    Q = np.full((n, qmax), 4, np.int32)
    T = np.full((n, tmax), 4, np.int32)
    ql = np.zeros(n, np.int32)
    tl = np.zeros(n, np.int32)
    for i in range(n):
        q = rng.integers(0, 4, int(rng.integers(8, qmax + 1)))
        t = q[: int(rng.integers(4, len(q) + 1))].copy()
        # mutate: substitutions + occasional indel
        m = rng.random(len(t)) > sim
        t[m] = (t[m] + rng.integers(1, 4, m.sum())) % 4
        if len(t) > 12 and rng.random() < 0.5:
            cut = int(rng.integers(1, 4))
            pos = int(rng.integers(1, len(t) - cut))
            t = np.concatenate([t[:pos], t[pos + cut:]])
        if len(t) < tmax and rng.random() < 0.3:
            t = np.concatenate(
                [t, rng.integers(0, 4, int(rng.integers(0, tmax - len(t))))])
        t = t[:tmax]
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
        ql[i], tl[i] = len(q), len(t)
    h0 = rng.integers(1, 80, n).astype(np.int32)
    return Q, T, ql, tl, h0


def _check(params, Q, T, ql, tl, h0):
    mat = make_score_matrix(params.max_mat, params.mismatch)
    ref = extend_batch(jnp.asarray(Q), jnp.asarray(T), jnp.asarray(ql),
                       jnp.asarray(tl), jnp.asarray(h0), jnp.asarray(mat),
                       params)
    got = extend_batch_banded(jnp.asarray(Q), jnp.asarray(T),
                              jnp.asarray(ql), jnp.asarray(tl),
                              jnp.asarray(h0), params, interpret=True)
    for k in ("score", "qle", "tle", "gscore", "gtle", "max_off"):
        r = np.asarray(ref[k])
        g = np.asarray(got[k])
        bad = np.nonzero(r != g)[0]
        assert bad.size == 0, (
            f"{k} mismatch at jobs {bad[:8]}: ref={r[bad[:8]]} "
            f"got={g[bad[:8]]} (ql={ql[bad[:8]]}, tl={tl[bad[:8]]}, "
            f"h0={h0[bad[:8]]})")


def test_banded_matches_lax_narrow_band():
    rng = np.random.default_rng(11)
    p = ExtendParams(w=50, zdrop=0)
    _check(p, *_mk(rng, 48, 400, 420))


def test_banded_matches_lax_default_band_long():
    rng = np.random.default_rng(12)
    p = ExtendParams(w=100, zdrop=0)
    _check(p, *_mk(rng, 32, 900, 950))


def test_banded_zdrop_and_large_h0():
    rng = np.random.default_rng(13)
    Q, T, ql, tl, h0 = _mk(rng, 32, 500, 520, sim=0.7)
    # large h0: exercises the H0-beyond-window region + b0 boundary decay
    h0 = rng.integers(150, 400, len(ql)).astype(np.int32)
    p = ExtendParams(w=64, zdrop=100)
    _check(p, Q, T, ql, tl, h0)


def test_banded_short_reads_window_covers_all():
    # qlen < w: the window spans the whole query; must still agree
    rng = np.random.default_rng(14)
    p = ExtendParams(w=100, zdrop=0)
    _check(p, *_mk(rng, 32, 80, 90))


def test_banded_pacbio_scoring():
    # -x pacbio: a=1 b=1 o=1 e=1 (cli.py presets), long reads
    rng = np.random.default_rng(15)
    p = ExtendParams(o_del=1, e_del=1, o_ins=1, e_ins=1, w=100,
                     zdrop=100, max_mat=1, mismatch=1)
    _check(p, *_mk(rng, 24, 1200, 1250, sim=0.8))


def test_banded_degenerate_lanes():
    # tlen=0 lanes, qlen tiny, N codes in both sequences
    rng = np.random.default_rng(16)
    Q, T, ql, tl, h0 = _mk(rng, 16, 300, 300)
    tl[3] = 0
    ql[5] = 1
    Q[7, 10:30] = 4
    T[9, 5:25] = 4
    p = ExtendParams(w=64, zdrop=0)
    _check(p, Q, T, ql, tl, h0)
