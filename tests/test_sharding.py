"""Multi-chip sharding tests on an 8-virtual-device CPU mesh.

The reference has no distributed layer (SURVEY.md 2); these tests pin the
BASELINE.json north-star behaviors: row-sharded corpus, replicated merges,
exact cross-shard carry resolution, psum-style pair-count reduction.
"""

import numpy as np
import pytest

import jax

from blt_tpu.merges import MergeTable
from blt_tpu.ops import bpe_numpy
from blt_tpu.parallel.mesh import make_mesh, replicated, row_sharding, vec_sharding
from blt_tpu.parallel.sharded import (
    pair_count_hist,
    sharded_basic_encode,
    sharded_flat_encode,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)

MERGES = {(97, 98): 256, (98, 99): 257, (99, 97): 258, (97, 97): 259}


def make_batch(corpus: np.ndarray, b: int, n: int):
    batch = np.zeros((b, n), np.uint8)
    lengths = np.zeros(b, np.int32)
    for r in range(b):
        row = corpus[r * n : (r + 1) * n]
        batch[r, : row.shape[0]] = row
        lengths[r] = row.shape[0]
    return batch, lengths


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_sharded_flat_encode_exact(mesh):
    rng = np.random.default_rng(3)
    table = MergeTable.build(MERGES)
    b, n = len(jax.devices()), 1024
    corpus = rng.choice(
        np.frombuffer(b"abcabcaabbccaaaa", np.uint8), size=b * n - 100
    ).astype(np.uint8)
    batch, lengths = make_batch(corpus, b, n)

    batch_d = jax.device_put(batch, row_sharding(mesh))
    lengths_d = jax.device_put(lengths, vec_sharding(mesh))
    dense_d = jax.device_put(table.dense, replicated(mesh))

    tokens, counts, _ = sharded_flat_encode(batch_d, lengths_d, dense_d)
    tokens_h, counts_h = np.asarray(tokens), np.asarray(counts)
    got = np.concatenate([tokens_h[r, : counts_h[r]] for r in range(b)])
    expected = bpe_numpy.bpe_encode_flat(corpus, table)
    assert got.tolist() == expected.tolist()


def test_sharded_flat_encode_adversarial_runs(mesh):
    """All-'aa' corpus: the parity chain crosses every shard boundary."""
    table = MergeTable.build({(97, 97): 256})
    b, n = len(jax.devices()), 256
    # odd total length forces a trailing unmerged byte
    corpus = np.full(b * n - 1, 97, np.uint8)
    batch, lengths = make_batch(corpus, b, n)
    tokens, counts, _ = sharded_flat_encode(
        jax.device_put(batch, row_sharding(mesh)),
        jax.device_put(lengths, vec_sharding(mesh)),
        jax.device_put(table.dense, replicated(mesh)),
    )
    tokens_h, counts_h = np.asarray(tokens), np.asarray(counts)
    got = np.concatenate([tokens_h[r, : counts_h[r]] for r in range(b)])
    expected = bpe_numpy.bpe_encode_flat(corpus, table)
    assert got.tolist() == expected.tolist()
    # (b*n-1) 'a's -> (b*n-2)/2 merged pairs + 1 leftover
    assert got.shape[0] == (b * n - 2) // 2 + 1


def test_sharded_basic_encode(mesh):
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 256, (len(jax.devices()), 512), dtype=np.uint8)
    out = np.asarray(sharded_basic_encode(jax.device_put(batch, row_sharding(mesh))))
    for r in range(batch.shape[0]):
        assert out[r].tobytes() == batch[r].astype(">u2").tobytes()


def test_pair_count_hist(mesh):
    corpus = np.frombuffer(b"ababab" * 100, np.uint8).copy()
    b, n = len(jax.devices()), 128
    batch, lengths = make_batch(corpus, b, n)
    hist = np.asarray(
        pair_count_hist(
            jax.device_put(batch, row_sharding(mesh)),
            jax.device_put(lengths, vec_sharding(mesh)),
        )
    )
    # 600 bytes -> 599 adjacent pairs: 300x (a,b), 299x (b,a)
    assert hist.sum() == corpus.shape[0] - 1
    assert hist[97 * 256 + 98] == 300
    assert hist[98 * 256 + 97] == 299


def test_learn_bpe_roundtrip(tmp_path):
    from blt_tpu.merges import load_bpe_merges_from_path
    from blt_tpu.parallel.train import learn_bpe, save_merges

    corpus = b"the cat sat on the mat " * 50
    merges = learn_bpe(corpus, 8)
    assert len(merges) == 8
    # most frequent first pair in this corpus is one of the repeating bigrams
    ids = sorted(merges.values())
    assert ids == list(range(256, 264))
    # byte-pair-only prefix round-trips through the reference file grammar
    byte_rules = {k: v for k, v in merges.items() if k[0] < 256 and k[1] < 256}
    p = tmp_path / "m.txt"
    save_merges(merges, p)
    loaded = load_bpe_merges_from_path(p)
    if len(byte_rules) == len(merges):
        assert loaded == merges


def test_learn_bpe_sharded_matches_single_device(mesh):
    """Sharded training (global count reduction) learns the same rules as
    the single-device trainer when no boundary pair is ever the winner."""
    from blt_tpu.parallel.train import learn_bpe, learn_bpe_sharded
    from blt_tpu.parallel.mesh import row_sharding, vec_sharding

    corpus = (b"the cat sat on the mat | " * 64)[:-2]
    b, n = len(jax.devices()), 256
    arr = np.frombuffer(corpus, np.uint8)
    batch = np.zeros((b, n), np.uint8)
    lengths = np.zeros(b, np.int32)
    for r in range(b):
        row = arr[r * n : (r + 1) * n]
        batch[r, : row.shape[0]] = row
        lengths[r] = row.shape[0]

    sharded = learn_bpe_sharded(
        np.asarray(jax.device_put(batch, row_sharding(mesh))),
        np.asarray(jax.device_put(lengths, vec_sharding(mesh))),
        6,
    )
    single = learn_bpe(corpus, 6)
    # same rule count and id policy; exact rule sets can diverge because
    # sharded counting excludes row-boundary pairs (documented), which
    # shifts tie-breaks and cascades through hierarchical rule ids
    assert len(sharded) == len(single) == 6
    assert sorted(sharded.values()) == sorted(single.values()) == list(
        range(256, 262)
    )
    # the learned table actually compresses the training corpus
    from blt_tpu.ops.bpe_numpy import bpe_encode
    from blt_tpu.merges import MergeTable as MT

    toks = bpe_encode(arr, MT.build(sharded))
    assert len(toks) < 0.8 * arr.shape[0]


def test_train_checkpoint_resume(tmp_path):
    """An interrupted run resumed from its checkpoint matches a clean run."""
    import numpy as np

    from blt_tpu.parallel.train import (
        learn_bpe_sharded,
        load_checkpoint,
        save_checkpoint,
    )

    rng = np.random.default_rng(5)
    batch = rng.choice(
        np.frombuffer(b"abcabcaabb  ", np.uint8), size=(4, 512)
    ).astype(np.uint8)
    lengths = np.full(4, 512, np.int32)
    ckpt = str(tmp_path / "train.ckpt.npz")

    clean = learn_bpe_sharded(batch, lengths, 6)

    # "crash" after 3 rules: run with a smaller budget, checkpointing
    learn_bpe_sharded(
        batch, lengths, 3, checkpoint_path=ckpt, checkpoint_every=1
    )
    merges, new_id, tok, lens = load_checkpoint(ckpt)
    assert len(merges) == 3 and new_id == 259
    # resume to the full budget; must equal the uninterrupted result
    resumed = learn_bpe_sharded(
        batch, lengths, 6, checkpoint_path=ckpt, checkpoint_every=2, resume=True
    )
    assert resumed == clean
    # checkpoint rewritten at completion and loadable
    merges2, new_id2, _, _ = load_checkpoint(ckpt)
    assert merges2 == clean and new_id2 == 256 + len(clean)

    # atomicity artifact: no stray tmp file left behind
    assert not (tmp_path / "train.ckpt.npz.tmp").exists()

    # save/load round-trip preserves dtypes and state exactly
    save_checkpoint(ckpt, merges2, tok, lens, new_id2)
    m3, n3, t3, l3 = load_checkpoint(ckpt)
    assert m3 == merges2 and n3 == new_id2
    assert np.array_equal(t3, tok) and np.array_equal(l3, lens)


def test_sharded_engine_pipeline_exact(tmp_path):
    """CLI-level --engine shard: file->file over the 8-device mesh must be
    byte-identical to the host engine, across multiple device batches
    (exercising the threaded batch carry) and a ragged final batch."""
    from blt_tpu.config import CoreConfig, Engine
    from blt_tpu.pipeline.runner import run_tokenizer

    rng = np.random.default_rng(11)
    # > 2 device batches (conftest sets BLT_DEVICE_BATCH_BYTES=256KB) with a
    # ragged tail; 'a'-heavy so parity chains cross row and batch edges
    corpus = rng.choice(
        np.frombuffer(b"abcabcaabbccaaaa", np.uint8), size=700_001
    ).tobytes()
    ip = tmp_path / "in.bin"
    ip.write_bytes(corpus)
    mp = tmp_path / "merges.txt"
    mp.write_text("97 98\n98 99\n99 97\n97 97\n")

    for merges in (None, mp):
        outs = {}
        for engine in (Engine.NUMPY, Engine.SHARD):
            op = tmp_path / f"out_{engine.value}.bin"
            run_tokenizer(
                CoreConfig.new_from_cli(
                    input=ip, output=op, merges=merges, engine=engine
                )
            )
            outs[engine] = op.read_bytes()
        assert outs[Engine.SHARD] == outs[Engine.NUMPY], (
            f"shard/host mismatch (merges={merges is not None})"
        )


def test_sharded_engine_all_a_adversarial(tmp_path):
    """All-'aa' stream: every row and batch boundary carries a pending
    merge; output must equal the single-sequence host encode."""
    from blt_tpu.config import CoreConfig, Engine
    from blt_tpu.pipeline.runner import run_tokenizer

    corpus = b"a" * 600_001  # odd: trailing unmerged byte
    ip = tmp_path / "in.bin"
    ip.write_bytes(corpus)
    mp = tmp_path / "merges.txt"
    mp.write_text("97 97\n")
    op1 = tmp_path / "shard.bin"
    op2 = tmp_path / "host.bin"
    run_tokenizer(CoreConfig.new_from_cli(
        input=ip, output=op1, merges=mp, engine=Engine.SHARD))
    run_tokenizer(CoreConfig.new_from_cli(
        input=ip, output=op2, merges=mp, engine=Engine.NUMPY))
    assert op1.read_bytes() == op2.read_bytes()


def test_sharded_engine_hierarchical_multipass(tmp_path):
    """General (non-flat) tables in the shard engine run row-parallel over
    the mesh with per-chunk reference semantics: output must equal the host
    engine at the same chunk size."""
    from blt_tpu.config import CoreConfig, Engine
    from blt_tpu.pipeline.runner import run_tokenizer

    rng = np.random.default_rng(5)
    corpus = rng.choice(
        np.frombuffer(b"abcabcdeab", np.uint8), size=700_000
    ).tobytes()
    ip = tmp_path / "in.bin"
    ip.write_bytes(corpus)
    merges = {(97, 98): 256, (256, 99): 257, (257, 100): 258}  # hierarchical

    outs = {}
    for engine in (Engine.NUMPY, Engine.SHARD):
        op = tmp_path / f"out_{engine.value}.bin"
        cfg = CoreConfig.new_from_cli(
            input=ip, output=op, chunksize="256KB", engine=engine
        )
        cfg.with_merges(merges)
        run_tokenizer(cfg)
        outs[engine] = op.read_bytes()
    assert outs[Engine.SHARD] == outs[Engine.NUMPY]
    assert len(outs[Engine.SHARD]) > 0


def test_sharded_engine_stream_short_reads_carry(tmp_path, monkeypatch):
    """stdin stream with short reads: intermediate batches get empty
    trailing rows, and an all-'a' corpus forces a pending merge carry to
    pass THROUGH those empty rows into the next batch (identity transfer
    functions). Output must equal the host engine on the same bytes."""
    import io
    import sys

    from blt_tpu.config import CoreConfig, Engine
    from blt_tpu.pipeline.runner import run_tokenizer

    data = b"a" * 300_001  # odd -> trailing unmerged byte at EOF

    class ShortStdin:
        def __init__(self, raw, maxread):
            self.buf = io.BytesIO(raw)
            self.maxread = maxread

        def read(self, n):
            return self.buf.read(min(n, self.maxread))

    # 70_001-byte short reads: odd chunk lengths, so nearly every row AND
    # batch boundary lands mid-'aa'-pair
    monkeypatch.setattr(
        sys, "stdin", type("S", (), {"buffer": ShortStdin(data, 70_001)})()
    )
    mp = tmp_path / "m.txt"
    mp.write_text("97 97\n")
    op1 = tmp_path / "shard.bin"
    run_tokenizer(CoreConfig.new_from_cli(
        input=None, output=op1, merges=mp, engine=Engine.SHARD))

    ip = tmp_path / "in.bin"
    ip.write_bytes(data)
    op2 = tmp_path / "host.bin"
    run_tokenizer(CoreConfig.new_from_cli(
        input=ip, output=op2, merges=mp, engine=Engine.NUMPY))
    assert op1.read_bytes() == op2.read_bytes()


class TestShardedTokenEncoder:
    """Row-parallel Pallas multipass over the mesh (interpret mode)."""

    def test_encode_batch_matches_oracle(self):
        from blt_tpu.merges import MergeTable
        from blt_tpu.ops.bpe_oracle import bpe_encode_oracle
        from blt_tpu.ops.bpe_pallas import ShardedTokenEncoder
        from blt_tpu.parallel.mesh import make_mesh

        merges = {(97, 98): 256, (256, 99): 257, (257, 257): 258}
        table = MergeTable.build(merges)
        assert ShardedTokenEncoder.supports(table)
        mesh = make_mesh()
        rng = np.random.default_rng(13)
        chunks = [
            rng.choice(np.frombuffer(b"abcabcde", np.uint8), size=s)
            for s in (1500, 3000, 1, 2, 700, 2048, 999, 10)
        ]
        enc = ShardedTokenEncoder(
            table, mesh, interpret=True, capacity_tokens=4096,
            rows_per_block=8,
        )
        got = enc.encode_batch(chunks)
        for chunk, toks in zip(chunks, got):
            expected = bpe_encode_oracle(chunk.tobytes(), merges)
            assert toks.tolist() == list(expected), chunk.shape

    def test_sharded_engine_multipass_pallas_route(self, monkeypatch):
        """The shard engine must route hierarchical tables through the
        Pallas path on TPU backends (VERDICT r1 item 5)."""
        from blt_tpu.merges import MergeTable
        from blt_tpu.pipeline import engines as eng

        engine = eng.ShardedJaxEngine()

        class FakeJax:
            def __getattr__(self, name):
                import jax

                return getattr(jax, name)

            def default_backend(self):
                return "tpu"

        engine._jax = FakeJax()
        monkeypatch.setattr(engine, "_mesh_platform", lambda: "tpu")
        called = {}

        def fake_pallas(chunks, table, hint):
            called["pallas"] = True
            yield b""

        monkeypatch.setattr(
            engine, "_bpe_multipass_sharded_pallas", fake_pallas
        )
        table = MergeTable.build({(97, 98): 256, (256, 99): 257})
        list(engine.bpe_stream(iter([np.zeros(4, np.uint8)]), table, 1024))
        assert called.get("pallas")


def test_sharded_resident_encode_batch_matches_oracle():
    """Per-device device-resident multipass loops (shard_map around
    lax.while_loop; divergent trip counts across devices) must equal
    the oracle and the host-compaction batch encoder."""
    from blt_tpu.merges import MergeTable
    from blt_tpu.ops.bpe_oracle import bpe_encode_oracle
    from blt_tpu.ops.bpe_pallas import ShardedTokenEncoder
    from blt_tpu.parallel.mesh import make_mesh

    merges = {(97, 98): 256, (256, 99): 257, (257, 257): 258}
    table = MergeTable.build(merges)
    mesh = make_mesh()
    rng = np.random.default_rng(23)
    # heterogeneous pass counts per device: all-'a'-style runs vs noise
    chunks = [
        rng.choice(np.frombuffer(b"abcabcde", np.uint8), size=s)
        for s in (2048, 1, 0, 700, 4096, 33, 999, 2)
    ][: len(jax.devices())]
    enc = ShardedTokenEncoder(
        table, mesh, interpret=True, capacity_tokens=4096, rows_per_block=8
    )
    got = enc.encode_batch_resident(chunks)
    ref = enc.encode_batch(chunks)
    for chunk, toks, toks2 in zip(chunks, got, ref):
        expected = list(bpe_encode_oracle(chunk.tobytes(), merges))
        assert toks.tolist() == expected, chunk.shape
        assert toks2.tolist() == expected, chunk.shape


class TestShardedFlatEncoder:
    """Halo-convergence Pallas flat sharding (interpret mode on the CPU
    mesh; the compiled kernel itself is certified on hardware by bench.py
    and the engine route by the driver dryrun)."""

    TABLE = MergeTable.build(
        {(97, 98): 256, (98, 99): 257, (99, 97): 258, (97, 97): 259}
    )

    def _encoder(self, mesh):
        from blt_tpu.ops.bpe_pallas import ShardedFlatEncoder

        # tiny blocks keep interpret mode fast: block = 8*128 = 1KB,
        # capacity 2KB => payload 1KB per device per batch
        return ShardedFlatEncoder(
            self.TABLE,
            mesh,
            interpret=True,
            capacity_bytes=2048,
            rows_per_block=8,
        )

    def test_halo_converges(self):
        from blt_tpu.ops.bpe_pallas import ShardedFlatEncoder

        dense = self.TABLE.dense
        allmatch = np.frombuffer(b"aa" * 600, np.uint8)  # (97,97) rule
        assert not ShardedFlatEncoder.halo_converges(dense, allmatch)
        mixed = np.frombuffer(b"aa" * 500 + b"zz" + b"aa" * 99, np.uint8)
        assert ShardedFlatEncoder.halo_converges(dense, mixed)
        # empty/1-byte halo = stream start
        assert ShardedFlatEncoder.halo_converges(dense, np.empty(0, np.uint8))

    @pytest.mark.parametrize("d2h", ["packed", "slots"])
    def test_engine_halo_stream_exact(self, mesh, d2h, monkeypatch):
        """Multi-batch random stream through the engine's halo route,
        byte-equal to the host oracle wire (both D2H formats)."""
        from blt_tpu.pipeline.engines import ShardedJaxEngine

        monkeypatch.setenv("BLT_D2H", d2h)
        eng = ShardedJaxEngine(mesh=mesh)
        enc = self._encoder(mesh)
        rng = np.random.default_rng(11)
        corpus = rng.choice(
            np.frombuffer(b"abcabcaabbccaaaa zqx", np.uint8), size=33000
        ).astype(np.uint8)
        hint = enc.payload * enc.n_rows  # full batches
        # irregular chunk sizes (each <= hint, the runner's contract)
        # exercise partial batches + tail halos
        cuts = [0, hint, 2 * hint - 517, 3 * hint - 517, 4 * hint - 517,
                corpus.shape[0]]
        chunks = [corpus[a:b] for a, b in zip(cuts, cuts[1:])]
        assert all(c.shape[0] <= hint for c in chunks)
        wire = b"".join(
            eng._bpe_flat_halo_stream(iter(chunks), self.TABLE, enc, hint)
        )
        expected = bpe_numpy.bpe_encode_flat(corpus, self.TABLE)
        got = np.frombuffer(wire, ">u2").astype(np.int64)
        assert got.tolist() == expected.tolist()

    @pytest.mark.parametrize("d2h", ["packed", "slots"])
    def test_engine_halo_stream_degenerate_fallback(
        self, mesh, d2h, monkeypatch
    ):
        """A >=HALO all-match run across a slab boundary must route that
        batch through the exact XLA path — and stay byte-exact (in packed
        mode this crosses BOTH emission-convention bridges: packed->XLA
        lo-byte prefix and XLA->packed first-position skip)."""
        import blt_tpu.parallel.sharded as sharded_mod
        from blt_tpu.pipeline.engines import ShardedJaxEngine

        monkeypatch.setenv("BLT_D2H", d2h)
        eng = ShardedJaxEngine(mesh=mesh)
        enc = self._encoder(mesh)
        hint = enc.payload * enc.n_rows
        corpus = np.concatenate(
            [
                np.frombuffer(b"abc" * 400, np.uint8),
                np.frombuffer(b"aa" * 3000, np.uint8),  # spans boundaries
                np.frombuffer(b"cab" * 400, np.uint8),
            ]
        )
        calls = {"n": 0}
        real = sharded_mod.sharded_flat_encode

        def spy(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(sharded_mod, "sharded_flat_encode", spy)
        chunks = [corpus[i : i + hint] for i in range(0, corpus.shape[0], hint)]
        wire = b"".join(
            eng._bpe_flat_halo_stream(iter(chunks), self.TABLE, enc, hint)
        )
        expected = bpe_numpy.bpe_encode_flat(corpus, self.TABLE)
        got = np.frombuffer(wire, ">u2").astype(np.int64)
        assert got.tolist() == expected.tolist()
        assert calls["n"] >= 1  # the degenerate batch actually fell back

    @pytest.mark.parametrize("d2h", ["packed", "slots"])
    def test_engine_halo_stream_pending_carry_transitions(
        self, mesh, d2h, monkeypatch
    ):
        """Deterministic pending-merge carries across BOTH mode
        transitions: a packed batch ends mid-merge into a degenerate
        (XLA) batch — bridge rule 2 must prepend the lo byte — and that
        XLA batch ends mid-merge into a converging packed batch — bridge
        rule 1 must skip the re-emitted first position."""
        import blt_tpu.parallel.sharded as sharded_mod
        from blt_tpu.pipeline.engines import ShardedJaxEngine

        monkeypatch.setenv("BLT_D2H", d2h)
        eng = ShardedJaxEngine(mesh=mesh)
        enc = self._encoder(mesh)
        hint = enc.payload * enc.n_rows
        H = enc.HALO
        filler = np.frombuffer(
            b"zq" * ((hint - H - 1) // 2) + b"z", np.uint8
        )
        # batch0 (pallas): filler then an ODD run of a's >= H+1 — its last
        # 'a' starts a (97,97) merge consuming batch1's first byte, and
        # batch1's slab-0 halo (all a's) is degenerate
        b0 = np.concatenate(
            [filler, np.frombuffer(b"a" * (hint - filler.size), np.uint8)]
        )
        assert (hint - filler.size) >= H + 1 and (hint - filler.size) % 2 == 1
        # batch1 (XLA): a's with a 'z' break near the end, ending in a
        # single 'a' that starts a merge into batch2 (carry_out true) while
        # leaving a non-match inside batch2's slab-0 halo (so it converges)
        b1 = np.frombuffer(b"a" * (hint - 2) + b"za", np.uint8)
        # batch2 (pallas again): first byte is the consumed half
        b2 = np.concatenate(
            [np.frombuffer(b"a", np.uint8), filler[: 4096 - 1]]
        )
        corpus = np.concatenate([b0, b1, b2])

        calls = {"n": 0}
        real = sharded_mod.sharded_flat_encode

        def spy(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(sharded_mod, "sharded_flat_encode", spy)
        wire = b"".join(
            eng._bpe_flat_halo_stream(iter([b0, b1, b2]), self.TABLE, enc, hint)
        )
        expected = bpe_numpy.bpe_encode_flat(corpus, self.TABLE)
        got = np.frombuffer(wire, ">u2").astype(np.int64)
        assert got.tolist() == expected.tolist()
        assert calls["n"] == 1  # exactly the middle batch fell back

    def test_engine_halo_stream_ffff_and_boundary_merges(self, mesh):
        """FF-FF rule + merges landing exactly on slab boundaries."""
        from blt_tpu.ops.bpe_pallas import ShardedFlatEncoder
        from blt_tpu.pipeline.engines import ShardedJaxEngine

        table = MergeTable.build(
            {(255, 255): 0xFFFF, (97, 98): 300, (98, 97): 301}
        )
        eng = ShardedJaxEngine(mesh=mesh)
        enc = ShardedFlatEncoder(
            table, mesh, interpret=True, capacity_bytes=2048, rows_per_block=8
        )
        hint = enc.payload * enc.n_rows
        rng = np.random.default_rng(5)
        corpus = rng.choice(
            np.frombuffer(b"ababbaz\xff\xff\xff", np.uint8), size=2 * hint + 77
        ).astype(np.uint8)
        chunks = [corpus[i : i + hint] for i in range(0, corpus.shape[0], hint)]
        wire = b"".join(
            eng._bpe_flat_halo_stream(iter(chunks), table, enc, hint)
        )
        expected = bpe_numpy.bpe_encode_flat(corpus, table)
        got = np.frombuffer(wire, ">u2").astype(np.int64)
        assert got.tolist() == expected.tolist()
