"""TAPE contact-prediction eval test on a synthetic ProteinNet tree."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig
    from omnibiote_tpu.training.train import Trainer
    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=64, vocab_size=2 ** 16,
                          block_size=256, dropout=0.0, attn_impl="xla",
                          compute_dtype="float32")
    tc = TrainConfig(batch_size=8, mini_batch_size=1, ctx_len=256,
                     token_budget=1e9,
                     save_dir=str(tmp_path_factory.mktemp("ck")), save_name="m")
    return Trainer(cfg, tc, batch_iter=iter(())).save_checkpoint(final=True)


def test_process_inverse_roundtrip():
    from omnibiote_tpu.evals.contact import (
        process_sample, inverse_process_sample)
    from omnibiote_tpu.tokenizer import load_reference

    sp = load_reference("mixed")
    seq = "MKVLAGIWQRSTMKVLAGIWQRST"
    n = len(seq)
    rng = np.random.default_rng(0)
    cm = (rng.random((n, n)) < 0.2).astype(np.float32)
    cm = np.maximum(cm, cm.T)
    mask = np.ones((n, n), np.float32)

    tok, tcm, tmask, tnsr = process_sample(sp, seq, cm, mask, 65533)
    inner = len(tok) - 2
    assert tcm.shape == (inner, inner)
    assert tmask.max() == 1.0
    # max-pool property: a token-pair is 1 iff some char pair in the span is 1
    lens = [len(sp.decode([t])) for t in tok]
    spans = []
    p = 0
    for L in lens[1:-1]:
        spans.append((p, p + L))
        p += L
    for i in range(inner):
        for j in range(inner):
            a0, a1 = spans[i]
            b0, b1 = spans[j]
            assert tcm[i, j] == cm[a0:a1, b0:b1].max()

    up = inverse_process_sample(sp, tok, tcm)
    # reference off-by-one reproduced: border tokens' rows stay zero,
    # middle spans are constant blocks
    assert up.shape[0] == sum(lens[1:-1])


def test_contact_eval_end_to_end(ckpt, tmp_path):
    from omnibiote_tpu.evals.contact import run_contact_eval

    rng = np.random.default_rng(1)
    pn_dir = tmp_path / "data" / "proteinnet"
    pn_dir.mkdir(parents=True)
    for split, n_rec in (("train", 10), ("valid", 4), ("test", 4)):
        data = []
        for _ in range(n_rec):
            n = int(rng.integers(30, 50))
            seq = "".join(rng.choice(list("MKVLAGIW"), size=n))
            tert = rng.uniform(0, 30, size=(n, 3)).tolist()
            data.append({"primary": seq, "tertiary": tert,
                         "valid_mask": [1] * n})
        (pn_dir / f"proteinnet_{split}.json").write_text(json.dumps(data))

    results = run_contact_eval(
        "/root/reference/tokenizers/mixed_bpe.model", ckpt,
        banned_token=65533, data_dir=str(tmp_path / "data"),
        num_epochs=8, num_accumulation_steps=4, num_tests=2,
        resnet_blocks=2, seed=0, cache=False)
    assert "test" in results and "test_best" in results
    mp, lp, ma, la = results["test_best"]
    assert all(np.isfinite(v) for v in (mp, lp, ma, la))
    assert 0.0 <= ma <= 1.0 and 0.0 <= la <= 1.0
