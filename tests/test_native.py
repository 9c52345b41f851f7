"""Native C++ host engine tests (skipped when the .so is not built)."""

import random

import numpy as np
import pytest

from blt_tpu import native
from blt_tpu.merges import MergeTable
from blt_tpu.ops.bpe_numpy import bpe_encode_flat
from blt_tpu.ops.bpe_pallas import filter_slots

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libbltnative.so could not be built"
)


def test_ensure_built_self_builds(tmp_path, monkeypatch):
    """A fresh checkout self-builds the .so on first load (atomic rename)."""
    from blt_tpu.native import build as nb

    out = nb.ensure_built()
    assert out is not None and out.endswith("libbltnative.so")
    # stale .so (older than source) triggers a rebuild
    import os

    os.utime(out, (0, 0))
    assert nb.ensure_built() == out
    assert os.path.getmtime(out) >= os.path.getmtime(nb.SRC)
    # BLT_NATIVE_BUILD=0 suppresses building but keeps an existing lib
    monkeypatch.setenv("BLT_NATIVE_BUILD", "0")
    assert nb.ensure_built() == out


def test_widen_be():
    rng = np.random.default_rng(0)
    for n in [0, 1, 7, 8, 9, 100_001]:
        d = rng.integers(0, 256, n, dtype=np.uint8)
        assert native.widen_be(d, 3) == d.astype(">u2").tobytes()


def test_flat_bpe_vs_numpy_with_carries():
    rng = np.random.default_rng(1)
    prng = random.Random(2)
    for _ in range(25):
        merges = {}
        vocab = 256
        for _ in range(prng.randint(1, 20)):
            merges[(prng.randint(97, 101), prng.randint(97, 101))] = vocab
            vocab += 1
        table = MergeTable.build(merges)
        n = prng.randint(2, 40_000)
        data = rng.integers(97, 102, n).astype(np.uint8)
        if prng.random() < 0.3:
            data[: min(n, 2000)] = 97  # adversarial parity run
        expected = bpe_encode_flat(data, table).astype(">u2").tobytes()
        out, _ = native.flat_bpe(data, table.dense, False, -1, prng.choice([1, 4]))
        assert out == expected
        cut = prng.randint(1, n)
        nb = int(data[cut]) if cut < n else -1
        o1, c1 = native.flat_bpe(data[:cut], table.dense, False, nb, 2)
        o2, _ = native.flat_bpe(data[cut:], table.dense, c1, -1, 2)
        assert bytes(o1) + bytes(o2) == expected


def test_filter_slots_native_matches_python():
    rng = np.random.default_rng(3)
    for _ in range(30):
        n = int(rng.integers(0, 3000))
        slots = rng.integers(0, 65536, n).astype(np.uint16)
        prev = int(rng.integers(0, 65536))
        exp_toks, exp_last = filter_slots(slots, prev)
        wire, last = native.filter_slots_native(slots, prev, 3)
        assert wire == exp_toks.tobytes()
        if n:
            assert last == exp_last & 0xFFFF
