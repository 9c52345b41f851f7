"""BPE merge-table training (learning merges from a corpus).

A capability extension over the reference (which only consumes pre-built
merges files, blt_core/src/config_loader.rs): learn the rules with the
classic greedy procedure — repeatedly count adjacent-pair frequencies and
merge the most frequent pair — with counting and merging running on device.
Emitted rules use the same id policy as the reference loader (ids from 256,
one per rule, config_loader.rs:14-46). Note the encoder applies pass-based
greedy semantics (all rules eligible per pass, tokenizer.rs:61-86), not
classic rank-ordered BPE, so encoding the training corpus is not guaranteed
to reproduce the training-time merge sequence rule-for-rule — the same
deviation from classic BPE the reference itself has (SURVEY.md 2.1.2).

The pair domain grows as merges are learned, so counting uses a dense
(V, V) histogram with V = 256 + num_merges; merging one rule is the same
parity-scan + compaction used everywhere else. ``save_merges`` writes a
merges.txt the reference loader grammar accepts when all keys are byte
pairs (hierarchical rules are commented, since the file grammar is u8-only,
config_loader.rs:144-155).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blt_tpu.merges import BpeMerges
from blt_tpu.utils.logging import get_logger

log = get_logger("train")

# Plain int (not a device array): module import must never touch a backend.
_NEG_INF32 = -(2**31) + 1


@functools.partial(jax.jit, static_argnames=("vocab",))
def _count_pairs(tokens: jnp.ndarray, length: jnp.ndarray, vocab: int) -> jnp.ndarray:
    """Dense (vocab*vocab,) histogram of adjacent pairs within [0, length)."""
    n = tokens.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    nxt = jnp.roll(tokens, -1)
    valid = idx < (length - 1)
    pair_idx = jnp.where(valid, tokens * vocab + nxt, 0)
    hist = jnp.zeros(vocab * vocab, jnp.int32).at[pair_idx].add(
        valid.astype(jnp.int32), mode="drop"
    )
    return hist


@jax.jit
def _apply_one_rule(
    tokens: jnp.ndarray,
    length: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    new_id: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One leftmost-first non-overlapping merge pass for a single rule."""
    n = tokens.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    nxt = jnp.roll(tokens, -1)
    match = (tokens == a) & (nxt == b) & (idx < (length - 1))
    lnm = jax.lax.cummax(jnp.where(match, _NEG_INF32, idx))
    lz = jnp.maximum(lnm, jnp.int32(-1))
    starts = match & (((idx - lz) & 1) == 1)
    consumed = jnp.roll(starts, 1).at[0].set(False)
    out_vals = jnp.where(starts, new_id, tokens)
    keep = (~consumed) & (idx < length)
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    count = jnp.where(n > 0, pos[-1] + 1, 0).astype(jnp.int32)
    scatter_idx = jnp.where(keep, pos, n)
    out = jnp.zeros((n,), jnp.int32).at[scatter_idx].set(
        out_vals, mode="drop", unique_indices=True
    )
    return out, count


def _check_vocab(num_merges: int) -> int:
    """Dense-histogram vocab guard: pair ids are tokens*vocab+nxt in int32,
    so vocab must satisfy vocab**2 <= INT32_MAX (and the (V,V) histogram
    must stay allocatable); beyond that the counts would silently wrap
    and mode="drop" would discard them, biasing training."""
    vocab = 256 + num_merges
    if vocab * vocab > 2**31 - 1:
        raise ValueError(
            f"num_merges={num_merges} needs vocab {vocab}, beyond the dense "
            "pair-histogram design limit (vocab**2 must fit int32, i.e. "
            "num_merges <= 46084)"
        )
    return vocab


def learn_bpe(data: bytes | np.ndarray, num_merges: int) -> BpeMerges:
    """Learn ``num_merges`` rules from a byte corpus (greedy max-frequency).

    Ties break toward the smallest pair index (deterministic). Stops early
    when no pair occurs twice.
    """
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    vocab = _check_vocab(num_merges)
    tokens = jnp.asarray(arr.astype(np.int32))
    length = jnp.int32(arr.shape[0])
    merges: BpeMerges = {}
    new_id = 256
    for _ in range(num_merges):
        hist = _count_pairs(tokens, length, vocab)
        best = int(jnp.argmax(hist))
        best_count = int(hist[best])
        if best_count < 2:
            break
        a, b = best // vocab, best % vocab
        merges[(a, b)] = new_id
        tokens, length = _apply_one_rule(
            tokens, length, jnp.int32(a), jnp.int32(b), jnp.int32(new_id)
        )
        new_id += 1
    return merges


def save_merges(merges: BpeMerges, path) -> None:
    """Write merges.txt in the reference loader grammar.

    Only u8-pair keys are representable in the file format
    (config_loader.rs:144-155); hierarchical rules are emitted as comments.
    Rules are written in id order, so when every rule is a byte pair the
    loader re-assigns identical ids; skipped hierarchical rules shift later
    ids on reload (the file grammar cannot express them).
    """
    with open(path, "w") as f:
        f.write("# merges learned by blt_tpu.parallel.train.learn_bpe\n")
        for (a, b), v in sorted(merges.items(), key=lambda kv: kv[1]):
            if a < 256 and b < 256:
                f.write(f"{a} {b}\n")
            else:
                f.write(f"# hierarchical rule ({a},{b})->{v} not file-representable\n")


@functools.partial(jax.jit, static_argnames=("vocab",))
def _count_pairs_sharded(
    tokens: jnp.ndarray, lengths: jnp.ndarray, vocab: int
) -> jnp.ndarray:
    """Global pair histogram over a row-sharded (B, N) token batch.

    Row-local scatter-adds followed by a cross-row sum; under a mesh the
    sum lowers to the psum of BASELINE.json's "per-pair count reductions".
    Row-boundary pairs are excluded — training counts are statistical, and
    skipping B-1 pairs out of ~B*N keeps every row independent.
    """
    hists = jax.vmap(_count_pairs, in_axes=(0, 0, None))(tokens, lengths, vocab)
    return jnp.sum(hists, axis=0)


_apply_one_rule_rows = jax.jit(jax.vmap(_apply_one_rule, in_axes=(0, 0, None, None, None)))


def save_checkpoint(
    path,
    merges: BpeMerges,
    tokens: np.ndarray,
    lengths: np.ndarray,
    new_id: int,
) -> None:
    """Atomically persist a training state (crash-safe: tmp + rename).

    The reference has no checkpoint/resume at all (SURVEY.md 5); a failed
    run there loses everything and can leave truncated output. Training
    state here is the full resumable tuple: learned rules so far, the next
    rule id, and the working token rows with their live lengths.
    """
    keys = np.array(list(merges.keys()), np.int32).reshape(-1, 2)
    vals = np.array(list(merges.values()), np.int32)
    # unique tmp name (concurrent trainers must not clobber each other's
    # half-written state) + fsync before the rename: on ext4/xfs the
    # rename can become durable before the data, which would leave a
    # truncated checkpoint at the final path after a power loss
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(
                f,
                keys=keys,
                vals=vals,
                new_id=np.int32(new_id),
                tokens=np.asarray(tokens),
                lengths=np.asarray(lengths),
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def load_checkpoint(path):
    """Load a save_checkpoint file -> (merges, new_id, tokens, lengths)."""
    z = np.load(path)
    merges = {
        (int(a), int(b)): int(v) for (a, b), v in zip(z["keys"], z["vals"])
    }
    return merges, int(z["new_id"]), z["tokens"], z["lengths"]


def learn_bpe_sharded(
    batch: np.ndarray,  # uint8[B, N] corpus rows (shard across a mesh)
    lengths: np.ndarray,  # int32[B]
    num_merges: int,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> BpeMerges:
    """Greedy BPE training over a row-sharded corpus.

    The data-parallel variant of learn_bpe: counting reduces globally
    across rows/shards each round; the winning rule is applied row-locally
    (merges never cross row boundaries during training — a statistical
    approximation that keeps every round embarrassingly parallel).
    Deterministic: ties break toward the smallest pair index.

    With ``checkpoint_path`` set and ``checkpoint_every`` > 0, the full
    training state is persisted atomically every that-many learned rules
    (and once at completion); ``resume=True`` restarts from the checkpoint
    when it exists, producing the identical final table a crash-free run
    would have (training is deterministic).
    """
    vocab = _check_vocab(num_merges)
    merges: BpeMerges = {}
    new_id = 256
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        merges, new_id, tok_np, len_np = load_checkpoint(checkpoint_path)
        tokens = jnp.asarray(tok_np.astype(np.int32))
        lens = jnp.asarray(len_np.astype(np.int32))
        log.info(
            "resumed training from %s (%d rules learned)",
            checkpoint_path,
            len(merges),
        )
    else:
        tokens = jnp.asarray(batch.astype(np.int32))
        lens = jnp.asarray(lengths.astype(np.int32))
    while new_id - 256 < num_merges:
        hist = _count_pairs_sharded(tokens, lens, vocab)
        best = int(jnp.argmax(hist))
        if int(hist[best]) < 2:
            break
        a, b = best // vocab, best % vocab
        merges[(a, b)] = new_id
        tokens, lens = _apply_one_rule_rows(
            tokens, lens, jnp.int32(a), jnp.int32(b), jnp.int32(new_id)
        )
        new_id += 1
        if (
            checkpoint_path
            and checkpoint_every > 0
            and (new_id - 256) % checkpoint_every == 0
        ):
            save_checkpoint(checkpoint_path, merges, tokens, lens, new_id)
    if checkpoint_path and checkpoint_every > 0:
        save_checkpoint(checkpoint_path, merges, tokens, lens, new_id)
    return merges
