"""High-level Encoder API: strings -> pooled embeddings."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig
    from omnibiote_tpu.training.train import Trainer
    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=32, vocab_size=2 ** 16,
                          block_size=256, dropout=0.0, attn_impl="xla",
                          compute_dtype="float32")
    tc = TrainConfig(batch_size=8, mini_batch_size=1, ctx_len=256,
                     token_budget=1e9,
                     save_dir=str(tmp_path_factory.mktemp("ck")), save_name="m")
    return Trainer(cfg, tc, batch_iter=iter(())).save_checkpoint(final=True)


def test_encoder_api(ckpt):
    from omnibiote_tpu.api import Encoder

    enc = Encoder.from_checkpoint(ckpt, tokenizer="mixed")
    seqs = ["<DNA>ACGTACGTAGGCT", "<protein>MKVLAAGIWQRST",
            "<DNA>" + "ACGT" * 40]
    for method in ("mean", "first", "last", "max"):
        out = enc.encode_sequences(seqs, method=method, batch_size=2)
        assert out.shape == (3, 32)
        assert np.isfinite(out).all()

    # padding-masked mean differs from the reference-faithful (leaky) mean
    # for batches with mixed lengths
    masked = enc.encode_sequences(seqs, method="mean", mask_padding=True)
    leaky = enc.encode_sequences(seqs, method="mean", mask_padding=False)
    assert np.abs(masked - leaky).max() > 1e-6

    # single-sequence batch: first-token pooling is padding-invariant
    a = enc.encode_sequences([seqs[0]], method="first")
    b = enc.encode_sequences(seqs, method="first")[:1]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_encoder_quantized_serving(ckpt):
    """Encoder(quantize=True): the int8 serving conversion plugs into the
    strings-in/embeddings-out path and stays within quantisation noise of
    the bf16/fp32 encoder."""
    from omnibiote_tpu.api import Encoder

    enc = Encoder.from_checkpoint(ckpt, tokenizer="mixed")
    enc_q = Encoder.from_checkpoint(ckpt, tokenizer="mixed", quantize=True)
    assert enc_q.cfg.qkv_prepermuted

    seqs = ["<DNA>ACGTACGTAGGCT", "<protein>MKVLAAGIWQRST",
            "<DNA>" + "ACGT" * 40]
    a = enc.encode_sequences(seqs, method="mean", batch_size=2)
    b = enc_q.encode_sequences(seqs, method="mean", batch_size=2)
    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    assert float(np.min(np.sum(an * bn, -1))) > 0.99


def test_encode_cli_fasta_to_npz(ckpt, tmp_path):
    """python -m omnibiote_tpu.api: FASTA (.gz, multi-line records) ->
    npz with ids row-aligned to embeddings, matching a direct
    encode_sequences call with the same tag/method."""
    import gzip
    from omnibiote_tpu.api import Encoder, main

    fa = tmp_path / "seqs.fa.gz"
    with gzip.open(fa, "wt") as f:
        f.write(">p1 some description\nMKVLAA\nGIWQRST\n")
        f.write(">p2\nACDEFGHIKLMNPQRSTVWY\n")
        f.write(">p3 trailing-record-no-newline\nMKV")
    out = tmp_path / "emb.npz"
    rc = main(["--checkpoint", ckpt, "--fasta", str(fa),
               "--out", str(out), "--tag", "protein", "--method", "mean",
               "--batch-size", "2", "--chunk", "2"])
    assert rc == 0

    z = np.load(out)
    assert list(z["ids"]) == ["p1", "p2", "p3"]
    assert z["embeddings"].shape == (3, 32)
    assert z["embeddings"].dtype == np.float32

    enc = Encoder.from_checkpoint(ckpt, tokenizer="mixed")
    direct = enc.encode_sequences(
        ["<protein>MKVLAAGIWQRST", "<protein>ACDEFGHIKLMNPQRSTVWY",
         "<protein>MKV"], method="mean", batch_size=2)
    np.testing.assert_allclose(z["embeddings"], direct, rtol=1e-5,
                               atol=1e-6)


def test_encoder_data_parallel_mesh_matches_single_device(ckpt):
    """Encoder(mesh=...): rows shard over the 'data' axis; embeddings are
    identical to the single-device path, including a final short chunk
    that needs row padding up to the shard count."""
    import jax
    from omnibiote_tpu.api import Encoder
    from omnibiote_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4,), axis_names=("data",), devices=jax.devices()[:4])
    enc_dp = Encoder.from_checkpoint(ckpt, tokenizer="mixed", mesh=mesh)
    enc = Encoder.from_checkpoint(ckpt, tokenizer="mixed")
    assert enc_dp.n_data == 4

    seqs = ["<protein>MKVLAAGIWQRST", "<DNA>" + "ACGT" * 30,
            "<protein>ACDEFGHIK", "<DNA>ACGTACGT",
            "<protein>MKV"]  # 5 rows, batch 4 -> final chunk of 1 (pad 3)
    for method in ("mean", "max"):
        a = enc.encode_sequences(seqs, method=method, batch_size=4)
        b = enc_dp.encode_sequences(seqs, method=method, batch_size=4)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
