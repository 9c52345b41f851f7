"""Toolchain canary for the blocked 16-bit scan headroom.

flat_ablation_r4 (benches/results/flat_ablation_r4.json) established that
the flat-BPE kernel's remaining ~1.6x (19.4 -> ~30 GB/s noscan ceiling on
tokenizer.rs:61-86 semantics) is blocked by the Mosaic toolchain, not by
the algorithm: a 16-bit ``pltpu.roll`` crashes the TPU compile helper and
strided sublane reads (``x[0::2, :]``) are rejected at Pallas trace time.
This probe re-attempts both in MINIMAL k=1 kernels (the cheap lowering-
probe shape; see tools/exp_16bit.py for the full op isolation matrix).
When a jax/Mosaic upgrade makes BOTH pass, the 16-bit phase-1 scan from
tools/exp_scan.py becomes viable and the ablation should be revisited.

Run standalone (prints one JSON line) or via
tests/test_pallas.py::test_toolchain_canary_16bit_scan / bench.py, which
record the verdict every hardware round. Exit code 0 always (the verdict
is the JSON); a hung compile is the caller's timeout to enforce.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128
R = 8


def _probe(kern, out_shape):
    import jax
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = np.arange(R * LANES, dtype=np.int32).reshape(R, LANES) % 97
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )(jax.numpy.asarray(x))
        np.asarray(out)
        return True, ""
    except Exception as exc:  # noqa: BLE001 - any failure means "blocked"
        return False, f"{type(exc).__name__}: {str(exc)[:200]}"


def run_canary() -> dict:
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    def k_i16_roll(x_ref, o_ref):
        b = x_ref[:].astype(jnp.int16)
        o_ref[:] = pltpu.roll(b, 1, axis=1).astype(jnp.int32)

    def k_strided_sublane(x_ref, o_ref):
        o_ref[:] = x_ref[0::2, :]

    i16_ok, i16_err = _probe(
        k_i16_roll, jax.ShapeDtypeStruct((R, LANES), jnp.int32)
    )
    strided_ok, strided_err = _probe(
        k_strided_sublane, jax.ShapeDtypeStruct((R // 2, LANES), jnp.int32)
    )
    return {
        "backend": jax.default_backend(),
        "i16_roll_ok": i16_ok,
        "i16_roll_err": i16_err,
        "strided_sublane_ok": strided_ok,
        "strided_sublane_err": strided_err,
        "headroom_unblocked": i16_ok and strided_ok,
    }


if __name__ == "__main__":
    print(json.dumps(run_canary()), flush=True)
