"""Device FM primitives vs the NumPy oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.index.device import DeviceFMIndex
from bwamem_tpu.ops import fm as fmops
from bwamem_tpu.oracle.fmd import FMOracle


def test_occ4_matches_oracle(tiny_index):
    g, idx = tiny_index
    fm = DeviceFMIndex.from_host(idx)
    orc = FMOracle(idx)
    rng = np.random.default_rng(5)
    pts = np.concatenate(
        [rng.integers(0, idx.seq_len + 2, 200), [0, 1, idx.seq_len, idx.primary]]
    ).astype(np.int32)
    got = jax.jit(jax.vmap(lambda i: fmops.occ4(fm, i)))(jnp.asarray(pts))
    got = np.asarray(got)
    for p, row in zip(pts, got):
        np.testing.assert_array_equal(row, orc.occ4(int(p)), err_msg=f"i={p}")


def test_lf_and_sa_lookup(tiny_index):
    g, idx = tiny_index
    fm = DeviceFMIndex.from_host(idx)
    orc = FMOracle(idx)
    rng = np.random.default_rng(6)
    rows = rng.integers(0, idx.seq_len + 1, 300).astype(np.int32)
    got_lf = np.asarray(jax.jit(jax.vmap(lambda r: fmops.lf(fm, r)))(jnp.asarray(rows)))
    got_sa = np.asarray(
        jax.jit(jax.vmap(lambda r: fmops.sa_lookup(fm, r)))(jnp.asarray(rows))
    )
    for r, vlf, vsa in zip(rows, got_lf, got_sa):
        assert vlf == orc.lf(int(r)), f"lf({r})"
        assert vsa == orc.sa_lookup(int(r)), f"sa({r})"


def test_extension_matches_oracle(tiny_index):
    g, idx = tiny_index
    fm = DeviceFMIndex.from_host(idx)
    orc = FMOracle(idx)
    rng = np.random.default_rng(7)

    back = jax.jit(jax.vmap(lambda k, l, s: fmops.backward_ext4(fm, k, l, s)))
    fwd = jax.jit(jax.vmap(lambda k, l, s: fmops.forward_ext4(fm, k, l, s)))

    # random patterns; extend both directions and compare interval triples
    for trial in range(10):
        ln = int(rng.integers(1, 12))
        pos = int(rng.integers(0, len(g) - ln))
        pat = g[pos : pos + ln]
        iv = orc.set_intv(int(pat[0]))
        for c in pat[1:]:
            iv = orc.extend_forward(iv)[int(c)]
        ks = jnp.asarray([iv.k], jnp.int32)
        ls = jnp.asarray([iv.l], jnp.int32)
        ss = jnp.asarray([iv.s], jnp.int32)
        bk4, bl4, bs4 = (np.asarray(a)[0] for a in back(ks, ls, ss))
        fk4, fl4, fs4 = (np.asarray(a)[0] for a in fwd(ks, ls, ss))
        exp_b = orc.extend_backward(iv)
        exp_f = orc.extend_forward(iv)
        for c in range(4):
            assert (bk4[c], bl4[c], bs4[c]) == (exp_b[c].k, exp_b[c].l, exp_b[c].s)
            assert (fk4[c], fl4[c], fs4[c]) == (exp_f[c].k, exp_f[c].l, exp_f[c].s)
