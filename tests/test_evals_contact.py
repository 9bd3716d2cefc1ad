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


def test_predictions_invariant_to_pad_bucket(ckpt):
    """PAD-bucketed positions must be invisible: the same protein padded to
    two different bucket widths yields identical probabilities on the real
    region (the reference forwards unpadded batch-1 samples; r4 review found
    pair_features forwarding without segment ids)."""
    import jax
    import jax.numpy as jnp
    import optax
    from omnibiote_tpu.evals.contact import (
        _make_fns, init_contact_predictor, HEAD_DIM)
    from omnibiote_tpu.evals.common import init_linear_head
    from omnibiote_tpu.training.checkpoint import load_model_checkpoint
    from omnibiote_tpu.tokenizer import load_reference

    params, cfg = load_model_checkpoint(ckpt)
    sp = load_reference("mixed")
    # real pipeline tokenization (process_sample): tag+EOS wrapped, banned
    # tag id dropped; PAD id 1 appears ONLY in the bucket tail
    tok = [t for t in sp.encode("<protein>MKVLAGIWQRSTMKVLAGIWQRST<EOS>")
           if t != 65533]
    _, _, predict = _make_fns(cfg, optax.sgd(1e-3))
    key = jax.random.PRNGKey(0)
    joint = {"model": params,
             "head": init_linear_head(key, cfg.n_embd, HEAD_DIM),
             "cnn": init_contact_predictor(key)}

    n = len(tok) - 2
    probs = {}
    for width in (64, 128):
        tok_p = np.full((1, width + 2), 1, np.int32)
        tok_p[0, :len(tok)] = np.asarray(tok, np.int32)
        mask = np.zeros((width, width), np.float32)
        mask[:n, :n] = 1.0
        p = np.asarray(predict(joint, jnp.asarray(tok_p),
                               jnp.asarray(mask)))
        probs[width] = p[:n, :n]
    np.testing.assert_allclose(probs[64], probs[128], rtol=0, atol=2e-6)


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
