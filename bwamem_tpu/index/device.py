"""Device-resident FMD index (JAX pytree) + transfer from the host format.

Equivalent of the reference's one-shot H2D index copy (reference:
src/GPUSeed/seed_gen.cu:1524-1556 gpu_cpy_wrapper): the occ-interleaved BWT,
sampled-SA structures, L2 counts and the packed genome live in HBM for the
whole run. All arrays are int32 (bit-identical reinterpretation of the
uint32 host arrays); positions fit because build.py enforces
seq_len < 2^31.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .format import FMIndex


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceFMIndex:
    occ_blocks: jax.Array      # (n_blocks + n_sblocks, 8) int32 —
    #   rows [0, n_occ): occ checkpoints + packed bases;
    #   rows [n_occ, ..): sampled-SA bitmap blocks padded to width 8
    #   (single table so one fused gather pass serves the LF walk's occ
    #   row AND the sampled-row test — dependent gather passes serialize
    #   at fixed latency on TPU, see ops/fm.py)
    L2: jax.Array              # (5,) int64 (counts can exceed 2^31)
    n_occ_blocks: jax.Array    # () int32 — offset of the SSA rows
    ssa_vals: jax.Array        # (n_sampled,) int32 (uint32 low words)
    ssa_vals_hi: jax.Array     # (n_sampled,) uint8 (bits >= 32)
    pac_words: jax.Array       # (ceil(l_pac/16),) int32
    primary: jax.Array         # () int64
    seq_len: jax.Array         # () int64
    l_pac: jax.Array           # () int64
    sa_intv: int = field(metadata=dict(static=True), default=8)
    # static width switch: rows/positions are int64 only when the genome
    # needs >31 bits (human fwd+rev); small genomes keep the int32 fast
    # path (int64 emulation costs ~35% measured end-to-end)
    wide: bool = field(metadata=dict(static=True), default=False)

    @property
    def ssa_blocks(self):
        """(n_sblocks, 4) view for host-style access (tests/oracles)."""
        return self.occ_blocks[self.n_occ_blocks:, :4]

    @classmethod
    def from_host(cls, idx: FMIndex, device=None) -> "DeviceFMIndex":
        put = lambda a: jax.device_put(jnp.asarray(a), device)
        occ = idx.occ_blocks.view(np.int32)
        ssa = idx.ssa_blocks.view(np.int32)
        ssa8 = np.zeros((ssa.shape[0], 8), np.int32)
        ssa8[:, : ssa.shape[1]] = ssa
        hi = (idx.ssa_vals_hi if idx.ssa_vals_hi is not None
              else np.zeros(len(idx.ssa_vals), np.uint8))
        return cls(
            occ_blocks=put(np.concatenate([occ, ssa8], axis=0)),
            L2=put(idx.L2.astype(np.int64)),
            n_occ_blocks=put(np.int32(occ.shape[0])),
            ssa_vals=put(idx.ssa_vals.view(np.int32)),
            ssa_vals_hi=put(hi),
            pac_words=put(idx.pac_words.view(np.int32)),
            primary=put(np.int64(idx.primary)),
            seq_len=put(np.int64(idx.seq_len)),
            l_pac=put(np.int64(idx.l_pac)),
            sa_intv=int(idx.sa_intv),
            wide=bool(idx.seq_len + 2 >= (1 << 31)),
        )
