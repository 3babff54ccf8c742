"""Probe Mosaic's 16-bit op support on the current TPU target.

Round-1 finding: int16 DP in the extension kernel would halve VPU op
cost, but Mosaic rejected 16-bit compares ("Target does not support this
comparison"), rotates, iotas, and reductions. This probes each op class
in isolation so a toolchain update that unblocks int16 is noticed
immediately (ROADMAP item 2; the kernel keeps its dtype plumbing behind
`use_i16`).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/mosaic_probe.py
Prints one PASS/FAIL line per op class and a final verdict.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_case(name, kernel, out_dtype=jnp.int16, shape=(8, 128)):
    x = jnp.asarray(np.arange(np.prod(shape), dtype=np.int16)
                    .reshape(shape) % 100)
    try:
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, out_dtype),
                in_specs=[pl.BlockSpec(shape, lambda: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(shape, lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
            )(x)
        jax.block_until_ready(out)
        _ = np.asarray(out)
        print(f"PASS {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL {name}: {msg}")
        return False


def main() -> None:
    print("backend:", jax.devices()[0])
    ok = {}

    def k_cmp(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = jnp.where(x > jnp.int16(3), x, jnp.int16(0))

    ok["compare"] = run_case("int16 compare+select", k_cmp)

    def k_max(x_ref, o_ref):
        x = x_ref[:]
        m = jnp.max(x, axis=1, keepdims=True)
        o_ref[:] = jnp.broadcast_to(m, x.shape)

    ok["reduce"] = run_case("int16 lane reduction (max)", k_max)

    def k_iota(x_ref, o_ref):
        i = jax.lax.broadcasted_iota(jnp.int16, x_ref.shape, 1)
        o_ref[:] = x_ref[:] + i

    ok["iota"] = run_case("int16 iota", k_iota)

    def k_shift(x_ref, o_ref):
        x = x_ref[:]
        pad = jnp.full((x.shape[0], 1), jnp.int16(0), jnp.int16)
        o_ref[:] = jnp.concatenate([pad, x[:, :-1]], axis=1)

    ok["shift"] = run_case("int16 lane shift (concat-slice)", k_shift)

    def k_roll(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 1, 1)

    ok["roll"] = run_case("int16 pltpu.roll", k_roll)

    def k_conv(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.int32).astype(jnp.int16)

    ok["convert"] = run_case("int16<->int32 convert", k_conv)

    need = ("compare", "reduce", "shift", "convert")
    if all(ok.get(k) for k in need):
        print("VERDICT: int16 DP viable — flip use_i16 in "
              "ops/pallas/extend_kernel.py and rerun the oracle suite")
    else:
        blocked = [k for k in need if not ok.get(k)]
        print(f"VERDICT: int16 DP still blocked by: {', '.join(blocked)}")


if __name__ == "__main__":
    main()
