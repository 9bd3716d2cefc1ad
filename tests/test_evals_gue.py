"""GUE eval harness test on a synthetic learnable task."""
import os

import numpy as np
import pytest


def _make_gue_tree(root, n_train=64, n_val=32, n_test=32, seq_len=24, seed=0):
    """One 'tf' task, trivially learnable: the class is encoded by a fixed
    prefix so BPE tokenization is consistent across samples (the test
    exercises the harness, not model capacity)."""
    rng = np.random.default_rng(seed)
    task_dir = root / "tf" / "0"
    os.makedirs(task_dir)

    def make_split(n, fname):
        lines = ["sequence,label"]
        for i in range(n):
            y = i % 2
            prefix = "GGGGCCGGGGCC" if y else "ATATATATATAT"
            seq = prefix + "".join(rng.choice(list("ACGT"), size=seq_len))
            lines.append(f"{seq},{y}")
        (task_dir / fname).write_text("\n".join(lines) + "\n")

    make_split(n_train, "train.csv")
    make_split(n_val, "dev.csv")
    make_split(n_test, "test.csv")
    return str(root)


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    """A small trained-ish checkpoint on disk in our format."""
    import jax
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig, init_params
    from omnibiote_tpu.training.train import Trainer

    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=64, vocab_size=2 ** 16,
                          block_size=128, dropout=0.0, attn_impl="xla",
                          compute_dtype="float32")
    tc = TrainConfig(batch_size=8, mini_batch_size=1, ctx_len=128,
                     token_budget=1e9,
                     save_dir=str(tmp_path_factory.mktemp("ck")),
                     save_name="m")
    trainer = Trainer(cfg, tc, batch_iter=iter(()))
    path = trainer.save_checkpoint(final=True)
    return path


def test_gue_end_to_end(tiny_checkpoint, tmp_path, monkeypatch):
    from omnibiote_tpu.evals.gue import run_gue, epochs_for_task

    assert epochs_for_task("x/EMP_any") == 32
    assert epochs_for_task("x/mouse_0") == 100
    with pytest.raises(ValueError):
        epochs_for_task("x/unknown")

    gue_dir = _make_gue_tree(tmp_path)
    monkeypatch.chdir(tmp_path)
    results = run_gue(
        sp_dir="/root/reference/tokenizers/mixed_bpe.model",
        model_dir=tiny_checkpoint, banned_token=65533, gue_dir=gue_dir,
        pretraining_epochs=1, pretraining_num_accum_steps=2, batch_size=8,
        pretraining_lr=1e-3, finetuning_lr=1e-3, output_suffix="test",
        seed=0)
    assert len(results) == 1
    task, r = next(iter(results.items()))
    # motif task is learnable even by a tiny fresh model
    assert r["mcc"] > 0.3, r
    assert os.path.exists(tmp_path / "GUE_results_test.csv")
    csv = (tmp_path / "GUE_results_test.csv").read_text()
    assert csv.startswith("Task,MCC,F1")
