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
