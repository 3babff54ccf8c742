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
    occ_blocks: jax.Array      # (n_blocks, 8) int32
    L2: jax.Array              # (5,) int32
    ssa_blocks: jax.Array      # (n_sblocks, 4) int32
    ssa_vals: jax.Array        # (n_sampled,) int32
    pac_words: jax.Array       # (ceil(l_pac/16),) int32
    primary: jax.Array         # () int32
    seq_len: jax.Array         # () int32
    l_pac: jax.Array           # () int32
    sa_intv: int = field(metadata=dict(static=True), default=8)

    @classmethod
    def from_host(cls, idx: FMIndex, device=None) -> "DeviceFMIndex":
        put = lambda a: jax.device_put(jnp.asarray(a), device)
        return cls(
            occ_blocks=put(idx.occ_blocks.view(np.int32)),
            L2=put(idx.L2.astype(np.int32)),
            ssa_blocks=put(idx.ssa_blocks.view(np.int32)),
            ssa_vals=put(idx.ssa_vals.view(np.int32)),
            pac_words=put(idx.pac_words.view(np.int32)),
            primary=put(np.int32(idx.primary)),
            seq_len=put(np.int32(idx.seq_len)),
            l_pac=put(np.int32(idx.l_pac)),
            sa_intv=int(idx.sa_intv),
        )
