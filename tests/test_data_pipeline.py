"""Data pipeline tests: packer parity vs the reference, reader invariants,
mixture determinism, checkpoint/resume of the stream."""
import sys

import numpy as np
import pytest

from omnibiote_tpu.config import EOS_TOKEN, PAD_TOKEN
from omnibiote_tpu.data.loader import (
    shard_reader, pack_sequences, mixture_batches, batch_split,
    build_pipeline, ReaderState)


def _ref_loader():
    sys.path.insert(0, "/root/reference/training")
    import importlib
    mod = importlib.import_module("loader")
    sys.path.pop(0)
    return mod


def _synthetic_lines(seed, n, max_len=37):
    rng = np.random.default_rng(seed)
    lines = []
    for _ in range(n):
        ln = int(rng.integers(1, max_len))
        arr = rng.integers(4, 1000, size=ln).astype(np.int32)
        arr[-1] = EOS_TOKEN
        lines.append(arr)
    return lines


@pytest.mark.parametrize("use_padding", [False, True])
def test_packer_bitwise_parity_with_reference(use_padding):
    """pack_sequences reproduces get_sequence (loader.py:118-163) exactly,
    including its line-dropping edge cases."""
    ref = _ref_loader()
    lines = _synthetic_lines(0, 500)

    ours = pack_sequences(iter(lines), ctx_len=32, use_padding=use_padding)
    theirs = ref.get_sequence(iter(lines), 32, USE_PADDING=use_padding)

    for _ in range(120):
        try:
            a = next(ours)
        except StopIteration:
            a = None
        try:
            b = np.asarray(next(theirs), dtype=np.int32)
        except (StopIteration, RuntimeError):
            b = None
        if a is None or b is None:
            assert a is None and b is None
            break
        assert a.shape == (32,)
        np.testing.assert_array_equal(a, b)


def test_shard_reader_semantics(tmp_path):
    """Reader yields EOS-delimited sequences with banned tokens stripped,
    covering every shard each epoch."""
    rng = np.random.default_rng(1)
    all_tokens = []
    files = []
    banned = 65533
    for i in range(7):
        toks = []
        for _ in range(20):
            ln = int(rng.integers(1, 20))
            seq = rng.integers(4, 1000, size=ln)
            seq[-1] = EOS_TOKEN
            toks.extend(seq.tolist())
            if rng.random() < 0.3:
                toks.append(banned)
        arr = np.asarray(toks, dtype=np.int32)
        f = tmp_path / f"shard_{i}.npy"
        np.save(f, arr)
        files.append(str(f))
        all_tokens.append(arr)

    reader = shard_reader(files, banned_tokens=[banned], seed=3, chunk_files=3)
    got = []
    # one epoch's worth: count sequences in the corpus
    n_seqs = sum(int((a == EOS_TOKEN).sum()) for a in all_tokens)
    # allow for trailing partial sequences per chunk concatenation
    for _ in range(n_seqs):
        seq = next(reader)
        assert seq.dtype == np.int32
        assert banned not in seq
        assert len(seq) > 0
        got.append(seq)
    # multiset of non-banned tokens is preserved across one epoch (modulo
    # chunk-boundary partial sequences, which remain valid sequences)
    total_yielded = sum(len(s) for s in got)
    total_corpus = sum(int((a[a != banned] != 0).sum()) for a in all_tokens)
    assert total_yielded == total_corpus


def test_mixture_batch_counts_and_determinism():
    def make_gen(val):
        def g():
            while True:
                yield np.full((8,), val, dtype=np.int32)
        return g()

    split = batch_split(10, [0.8, 0.2])
    assert split == [8, 2]
    b1 = next(mixture_batches([make_gen(1), make_gen(2)], split, seed=5))
    b2 = next(mixture_batches([make_gen(1), make_gen(2)], split, seed=5))
    np.testing.assert_array_equal(b1["tokens"], b2["tokens"])
    assert (b1["tokens"][:, 0] == 1).sum() == 8
    assert (b1["tokens"][:, 0] == 2).sum() == 2
    assert b1["segments"].shape == b1["tokens"].shape


def test_pipeline_checkpoint_resume(tmp_path):
    """Restoring ReaderState resumes the stream at a chunk boundary with
    identical subsequent output."""
    rng = np.random.default_rng(2)
    (tmp_path / "c" / "train").mkdir(parents=True)
    for i in range(6):
        toks = []
        for _ in range(30):
            ln = int(rng.integers(1, 15))
            seq = rng.integers(4, 100, size=ln)
            seq[-1] = EOS_TOKEN
            toks.extend(seq.tolist())
        np.save(tmp_path / "c" / "train" / f"s{i}.npy",
                np.asarray(toks, dtype=np.int32))

    def fresh(states=None):
        return build_pipeline(
            str(tmp_path), ["c/train"], [1.0], batch_size=4, ctx_len=16,
            seed=7, reader_states=states)

    it, states = fresh()
    for _ in range(3):
        next(it)
    snap = [ReaderState.from_dict(s.to_dict()) for s in states]

    # continue original
    ref_next = [next(it)["tokens"] for _ in range(4)]

    # ROW-EXACT resume (r2 VERDICT #7): a fresh pipeline restored from the
    # snapshot continues with bit-identical batches — no chunk replay, no
    # skipped rows; ReaderState pins intra-chunk position, the packer's
    # partial row, and the mixture-shuffle index.
    it2, _ = fresh(states=snap)
    out2 = [next(it2)["tokens"] for _ in range(4)]
    for a, b in zip(ref_next, out2):
        np.testing.assert_array_equal(a, b)


def test_prefetcher_yields_device_arrays():
    import jax
    from omnibiote_tpu.data.prefetch import DevicePrefetcher

    def gen():
        for i in range(5):
            yield {"tokens": np.full((2, 4), i, np.int32)}

    pf = DevicePrefetcher(gen(), depth=2)
    got = [b["tokens"] for b in pf]
    assert len(got) == 5
    assert all(isinstance(g, jax.Array) for g in got)
    np.testing.assert_array_equal(np.asarray(got[3]), np.full((2, 4), 3))


def test_native_packer_bitwise_parity():
    """C++ packer == Python pack_sequences for the same line order, both
    modes, and the streaming wrapper carries partial rows across feeds."""
    from omnibiote_tpu.data.loader import pack_lines_native, NativePacker

    lines = _synthetic_lines(7, 400)
    for use_padding in (False, True):
        expect = []
        g = pack_sequences(iter(lines), ctx_len=32, use_padding=use_padding)
        try:
            while True:
                expect.append(np.asarray(next(g), np.int32))
        except (StopIteration, RuntimeError):
            pass  # generator ends when the finite line list runs dry
        # the generator blocks forever on next(reader) at stream end; emulate
        # by capping to the rows produced from the finite list
        rows, segs, consumed = pack_lines_native(lines, 32, use_padding)
        assert len(rows) >= len(expect) - 1
        for r_py, r_c in zip(expect, rows):
            np.testing.assert_array_equal(r_py, r_c)
        # segment ids match the host-side reference computation
        from omnibiote_tpu.ops.segments import segment_ids_np
        if len(rows):
            np.testing.assert_array_equal(segs, segment_ids_np(rows))

    # streaming: two feeds == one big feed
    packer = NativePacker(32)
    r1, _ = packer.feed(lines[:137])
    r2, _ = packer.feed(lines[137:])
    both = np.concatenate([r1, r2]) if len(r1) and len(r2) else (r1 if len(r1) else r2)
    rows_all, _, _ = pack_lines_native(lines, 32, False)
    np.testing.assert_array_equal(both, rows_all)


def test_native_padding_capacity_long_lines():
    """Padding mode with long lines (one line per row + PAD, the overflow
    line dropped — the reference's padding semantics): C++ must stay
    bit-parity with the Python packer here, and the row-buffer capacity
    must never truncate the stream (the retry loop guards the C++ packer's
    silent drop-at-capacity; r4 review)."""
    from omnibiote_tpu.data.loader import pack_lines_native

    rng = np.random.default_rng(21)
    lines = []
    for _ in range(300):
        ln = int(rng.integers(17, 22))   # ~0.6 * ctx 32 — one line per row
        arr = rng.integers(4, 1000, size=ln).astype(np.int32)
        arr[-1] = EOS_TOKEN
        lines.append(arr)

    expect = []
    g = pack_sequences(iter(lines), ctx_len=32, use_padding=True)
    try:
        while True:
            expect.append(np.asarray(next(g), np.int32))
    except (StopIteration, RuntimeError):
        pass
    rows, _, _ = pack_lines_native(lines, 32, True)
    # one row per TWO lines (each flush drops the overflowing line, per the
    # reference's padding semantics) — and no capacity truncation
    assert len(rows) >= len(expect) - 1 >= 140, (len(rows), len(expect))
    for r_py, r_c in zip(expect, rows):
        np.testing.assert_array_equal(r_py, r_c)


def test_native_chunk_rows_resume_carries_packer_state(tmp_path):
    """Chunk-granular resume: the packer carry is part of ReaderState — a
    resume without it would re-pack with an empty partial row and silently
    diverge from the uninterrupted stream (r4 review)."""
    from omnibiote_tpu.data.loader import ReaderState, native_chunk_rows

    rng = np.random.default_rng(13)
    files = []
    for i in range(4):
        toks = []
        for _ in range(200):
            ln = int(rng.integers(5, 40))
            seq = rng.integers(4, 1000, size=ln)
            seq[-1] = EOS_TOKEN
            toks.extend(seq.tolist())
        p = tmp_path / f"s{i}.npy"
        np.save(p, np.asarray(toks, np.int32))
        files.append(str(p))

    st = ReaderState(seed=5)
    g = native_chunk_rows(files, ctx_len=64, seed=5, chunk_files=2, state=st)
    next(g)                                        # chunk 0 consumed
    snap = ReaderState.from_dict(st.to_dict())
    assert snap.carry, "carry expected to be non-empty mid-stream"
    ref = [next(g) for _ in range(3)]              # crosses an epoch too

    g2 = native_chunk_rows(files, ctx_len=64, seed=5, chunk_files=2,
                           state=snap)
    got = [next(g2) for _ in range(3)]
    for (r1, s1), (r2, s2) in zip(ref, got):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(s1, s2)


def test_prefetcher_stays_exhausted():
    """A DevicePrefetcher that raised StopIteration must keep raising it:
    the single None sentinel is consumed once, so a later next() would
    otherwise block forever on the empty queue (r4 review)."""
    import pytest
    from omnibiote_tpu.data.prefetch import DevicePrefetcher

    pf = DevicePrefetcher(iter([{"x": np.zeros(2)}]), depth=2,
                          device_put=False)
    assert next(pf)["x"].shape == (2,)
    with pytest.raises(StopIteration):
        next(pf)
    for _ in range(3):                 # stays exhausted, never blocks
        with pytest.raises(StopIteration):
            next(pf)
    assert next(pf, None) is None      # the polling idiom from the review
    pf.close()


def test_native_chunk_rows_determinism_and_filter(tmp_path):
    from omnibiote_tpu.data.loader import native_chunk_rows
    from omnibiote_tpu.ops.segments import segment_ids_np

    rng = np.random.default_rng(4)
    files = []
    for i in range(4):
        toks = []
        for _ in range(300):
            ln = int(rng.integers(5, 40))
            seq = rng.integers(4, 1000, size=ln)
            seq[-1] = EOS_TOKEN
            toks.extend(seq.tolist())
            if rng.random() < 0.2:
                toks.append(65533)
        p = tmp_path / f"s{i}.npy"
        np.save(p, np.asarray(toks, np.int32))
        files.append(str(p))

    def collect(seed):
        g = native_chunk_rows(files, [65533], ctx_len=64, seed=seed,
                              chunk_files=2)
        rows1, segs1 = next(g)
        rows2, segs2 = next(g)
        return np.concatenate([rows1, rows2]), np.concatenate([segs1, segs2])

    r1, s1 = collect(9)
    r2, s2 = collect(9)
    r3, _ = collect(10)
    np.testing.assert_array_equal(r1, r2)          # deterministic
    assert r1.shape != r3.shape or (r1 != r3).any()  # seed-dependent
    assert not (r1 == 65533).any()                  # banned filtered
    np.testing.assert_array_equal(s1, segment_ids_np(r1))


def test_native_row_stream_midchunk_resume(tmp_path):
    """native_row_stream: save mid-chunk, resume in a fresh stream — the
    continued row stream is bit-identical to the uninterrupted one
    (r2 VERDICT #7: packer carry + intra-chunk row offset in ReaderState)."""
    from omnibiote_tpu.data.loader import native_row_stream

    rng = np.random.default_rng(11)
    files = []
    for i in range(4):
        toks = []
        for _ in range(200):
            ln = int(rng.integers(5, 40))
            seq = rng.integers(4, 1000, size=ln)
            seq[-1] = EOS_TOKEN
            toks.extend(seq.tolist())
        p = tmp_path / f"s{i}.npy"
        np.save(p, np.asarray(toks, np.int32))
        files.append(str(p))

    g = native_row_stream(files, [65533], ctx_len=64, seed=5, chunk_files=2)
    # consume into the middle of a chunk (each 2-file chunk yields ~dozens
    # of 64-token rows, so 17 rows is mid-chunk)
    for _ in range(17):
        next(g)
    snap = ReaderState.from_dict(g.state.to_dict())
    assert snap.row_idx > 0          # genuinely mid-chunk
    ref = [next(g) for _ in range(40)]  # crosses the next chunk boundary

    g2 = native_row_stream(files, [65533], ctx_len=64, seed=5,
                           chunk_files=2, state=snap)
    got = [next(g2) for _ in range(40)]
    for (r1, s1), (r2, s2) in zip(ref, got):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(s1, s2)


def test_trainer_resume_row_exact_with_prefetch(tmp_path):
    """End-to-end: a Trainer over the real pipeline WITH prefetch running
    ahead checkpoints mid-run; the restored run's losses match the
    uninterrupted run bit-for-bit (proving it consumed the same rows)."""
    import jax
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig
    from omnibiote_tpu.training.train import Trainer
    from omnibiote_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    (tmp_path / "c" / "train").mkdir(parents=True)
    for i in range(6):
        toks = []
        for _ in range(200):
            ln = int(rng.integers(4, 20))
            seq = rng.integers(4, 60, size=ln)
            seq[-1] = EOS_TOKEN
            toks.extend(seq.tolist())
        np.save(tmp_path / "c" / "train" / f"s{i}.npy",
                np.asarray(toks, dtype=np.int32))

    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=32, vocab_size=64,
                          block_size=32, dropout=0.0, attn_impl="xla",
                          compute_dtype="float32", mup_base_n_embd=16)
    tc = TrainConfig(batch_size=8, mini_batch_size=8, ctx_len=32, lr=1e-2,
                     token_budget=8 * 32 * 200.0, seed=0,
                     save_dir=str(tmp_path / "ck"), save_name="r")
    mesh = make_mesh((1,), axis_names=("data",), devices=jax.devices()[:1])

    def make(states=None):
        it, sts = build_pipeline(str(tmp_path), ["c/train"], [1.0],
                                 batch_size=8, ctx_len=32, seed=7,
                                 reader_states=states)
        return Trainer(cfg, tc, batch_iter=it, reader_states=sts,
                       mesh=mesh, prefetch=2)

    tr = make()
    for _ in range(3):
        tr.train_step_once()
    path = tr.save_checkpoint()
    ref_losses = [float(tr.train_step_once()["loss"]) for _ in range(4)]
    tr.close()

    tr2 = make()
    tr2.restore_checkpoint(path)
    # rebuild the pipeline from the RESTORED states (fresh generators)
    it2, sts2 = build_pipeline(str(tmp_path), ["c/train"], [1.0],
                               batch_size=8, ctx_len=32, seed=7,
                               reader_states=tr2.reader_states)
    tr2.batch_iter = it2
    tr2.reader_states = sts2
    got_losses = [float(tr2.train_step_once()["loss"]) for _ in range(4)]
    tr2.close()
    np.testing.assert_array_equal(np.asarray(ref_losses),
                                  np.asarray(got_losses))
