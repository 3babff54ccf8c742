"""Multi-chip data-parallel alignment over a jax.sharding.Mesh.

Replaces the reference's pthread pool + single-GPU design (SURVEY §2.5:
the reference has NO distributed backend) with the TPU-native layout:

  * the FMD index is REPLICATED per chip (P() specs — human-scale occ+SA
    fit in HBM),
  * read batches are SHARDED over the 'data' mesh axis,
  * per-shard alignment records are ALLGATHERED over ICI so every host can
    emit its ordered SAM slice (range-based sharding keeps input order).

Work stealing (reference: src/kthread.c:59-85) has no analog here: equal
read counts per shard give static balance; length bucketing upstream
handles the variance the reference's stealing compensated for.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.device import DeviceFMIndex
from ..models.mem import AlignStepConfig, device_align_step


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), (axis,))


def sharded_align_step(mesh: Mesh, cfg: AlignStepConfig = AlignStepConfig(),
                       axis: str = "data", gather_out: bool = True):
    """Returns a jitted function (fm, reads, lens) -> per-read outputs.

    fm is replicated; reads/lens are sharded on the batch dimension; the
    outputs are allgathered (so each process holds the full result) plus a
    psum'd total-seed count to exercise a reduction collective.
    """
    fm_specs = jax.tree_util.tree_map(lambda _: P(), _fm_proto())

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(fm_specs, P(axis), P(axis)),
        out_specs=(P(axis) if not gather_out else P(), P()),
        check_vma=False,
    )
    def step(fm, reads, lens):
        out = device_align_step(fm, reads, lens, cfg)
        total_seeds = jax.lax.psum(jnp.sum(out.pop("n_seeds")), axis)
        if gather_out:
            out = jax.tree_util.tree_map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                out,
            )
        return out, total_seeds

    return jax.jit(step)


def _fm_proto():
    """Pytree prototype with the same structure as DeviceFMIndex."""
    z = jnp.zeros((1,), jnp.int32)
    return DeviceFMIndex(
        occ_blocks=z, L2=z, n_occ_blocks=z, ssa_vals=z, ssa_vals_hi=z,
        pac_words=z, primary=z, seq_len=z, l_pac=z,
    )


def shard_reads(mesh: Mesh, reads: np.ndarray, lens: np.ndarray,
                axis: str = "data"):
    """Pad the batch to a multiple of the mesh size and device_put with a
    batch-sharded layout (range-based: shard i gets a contiguous slice,
    keeping SAM output order trivially mergeable)."""
    n_dev = mesh.devices.size
    B = reads.shape[0]
    Bp = -(-B // n_dev) * n_dev
    if Bp != B:
        reads = np.concatenate(
            [reads, np.full((Bp - B, reads.shape[1]), 4, reads.dtype)])
        lens = np.concatenate([lens, np.zeros(Bp - B, lens.dtype)])
    sh = NamedSharding(mesh, P(axis))
    return (jax.device_put(jnp.asarray(reads), sh),
            jax.device_put(jnp.asarray(lens), sh), B)


def replicate_index(mesh: Mesh, fm: DeviceFMIndex) -> DeviceFMIndex:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), fm)
