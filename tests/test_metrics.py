"""Metric sinks and MFU accounting."""
import json

from omnibiote_tpu.training.metrics import (
    JsonlSink, MultiSink, WandbSink, flops_per_token, mfu)


def test_flops_and_mfu():
    # reference formula 6N + 12*L*d*T (train_encoder.py:360)
    fpt = flops_per_token(168_000_000, 8, 1024, 1024)
    assert fpt == 6 * 168_000_000 + 12 * 8 * 1024 * 1024
    assert abs(mfu(100_000, fpt, 1, "v5e") - 100_000 * fpt / 197e12) < 1e-9


def test_jsonl_sink(tmp_path):
    p = tmp_path / "m.jsonl"
    sink = JsonlSink(str(p))
    sink.log({"step": 0, "loss": 1.5})
    sink.log({"step": 1, "loss": 1.25})
    sink.close()
    recs = [json.loads(l) for l in open(p)]
    assert [r["step"] for r in recs] == [0, 1]
    assert all("ts" in r for r in recs)


def test_multisink_and_disabled_wandb(tmp_path):
    p = tmp_path / "m.jsonl"
    ms = MultiSink(JsonlSink(str(p)), WandbSink(enabled=False), None)
    ms.log({"x": 1})
    ms.close()
    assert len(open(p).readlines()) == 1


def test_attention_tile_fraction_matches_kernel_bounds():
    """The metrics-side executed-tile count must equal the flash kernel's
    own _seg_block_bounds ranges (the tiles the kernel actually visits)."""
    import numpy as np
    import jax.numpy as jnp
    from omnibiote_tpu.training.metrics import attention_tile_fraction
    from omnibiote_tpu.ops.flash_attention import _seg_block_bounds
    from omnibiote_tpu.ops.segments import segment_ids_np

    rng = np.random.default_rng(0)
    toks = rng.integers(20, 60000, size=(4, 512)).astype(np.int32)
    for r in range(4):
        toks[r, rng.integers(16, 512, size=3)] = 3  # EOS
    seg = segment_ids_np(toks)
    for bq, bkv in ((128, 128), (128, 256), (256, 128), (512, 512)):
        frac = attention_tile_fraction(seg, bq, bkv)
        lo, hi = _seg_block_bounds(jnp.asarray(seg), jnp.asarray(seg),
                                   bq, bkv)
        lo, hi = np.asarray(lo), np.asarray(hi)
        kernel_tiles = (hi - lo + 1).sum()
        total = seg.shape[0] * (512 // bq) * (512 // bkv)
        assert abs(frac - kernel_tiles / total) < 1e-9, (bq, bkv)
    # one segment per row -> nothing skippable
    one = np.zeros((2, 512), np.int32)
    assert attention_tile_fraction(one, 128, 128) == 1.0


def test_flops_per_token_executed():
    """Executed <= nominal always; equality components behave: no segments
    -> only the head compaction is subtracted; many segments at long ctx
    -> most attention credit goes away."""
    import numpy as np
    from omnibiote_tpu.training.metrics import (
        flops_per_token, flops_per_token_executed)
    from omnibiote_tpu.ops.segments import segment_ids_np

    N, L, d, T, V = 100_000_000, 8, 1024, 2048, 2 ** 16
    nominal = flops_per_token(N, L, d, T)
    head_only = flops_per_token_executed(N, L, d, T, vocab_size=V)
    assert head_only == nominal - 6.0 * d * V * 0.75

    rng = np.random.default_rng(1)
    toks = rng.integers(20, 60000, size=(8, T)).astype(np.int32)
    for r in range(8):
        toks[r, rng.integers(16, T, size=15)] = 3  # ~16 segments/row
    seg = segment_ids_np(toks)
    both = flops_per_token_executed(N, L, d, T, vocab_size=V, segments=seg)
    assert both < head_only < nominal
    # xla impl never tile-skips
    assert flops_per_token_executed(
        N, L, d, T, vocab_size=V, segments=seg,
        attn_impl="xla") == head_only
