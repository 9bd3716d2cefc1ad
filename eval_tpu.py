"""On-TPU eval smoke (r2 VERDICT #4): drive one real fine-tune per family
on the chip through the FLASH path at bucketed lengths and record the
artifact EVAL_TPU.json.

  * GUE-style sequence classifier (first-token embedding head, MCC/F1) on a
    synthetic learnable motif task — reference protocol evals/gue.py:262-368.
  * ProteinGLUE SS3 token-level task (char->BPE mode-aligned labels,
    token head, ACC) — reference protocol evals/proteinGLUE.py:202-268.

Synthetic fixtures (the real corpora are not shipped, SURVEY C34); what this
proves is the whole fine-tune stack — tokenize -> bucket -> flash forward ->
head grads -> metric — executing on the TPU device end-to-end.
"""
import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SP = "/root/reference/tokenizers/mixed_bpe.model"


def _make_gue_tree(root, n_train=64, n_val=32, n_test=32, seq_len=24,
                   seed=0):
    rng = np.random.default_rng(seed)
    task_dir = os.path.join(root, "tf", "0")
    os.makedirs(task_dir)
    for fname, n in (("train.csv", n_train), ("dev.csv", n_val),
                     ("test.csv", n_test)):
        lines = ["sequence,label"]
        for i in range(n):
            y = i % 2
            prefix = "GGGGCCGGGGCC" if y else "ATATATATATAT"
            seq = prefix + "".join(rng.choice(list("ACGT"), size=seq_len))
            lines.append(f"{seq},{y}")
        with open(os.path.join(task_dir, fname), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root


def _protein_for_class(rng, y, n=24):
    pool = list("AW") if y else list("LV")
    return "".join(rng.choice(pool, size=n))


def _make_pglue_dir(root, seed=1):
    rng = np.random.default_rng(seed)
    os.makedirs(root)
    # ss_* for SS3 plus the CB513 test-only variant its head auto-evaluates
    for fname, n in (("ss_training.csv", 40), ("ss_validation.csv", 12),
                     ("ss_test.csv", 12), ("ss_cb513_test.csv", 12)):
        lines = ["sequence,ss3"]
        for i in range(n):
            seq = _protein_for_class(rng, i % 2, n=20)
            lab = [(0 if c == "A" else 1 if c == "W" else 2) for c in seq]
            lines.append(seq + ",[" + " ".join(str(v) for v in lab) + "]")
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root


def _flash_checkpoint(tmp):
    """A flash-capable model checkpoint (head_dim 128 so the Pallas kernel
    is eligible at every bucketed length)."""
    import jax
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig
    from omnibiote_tpu.training.train import Trainer

    cfg = OmniBioTAConfig(n_layer=2, n_head=2, n_embd=256,
                          vocab_size=2 ** 16, block_size=256, dropout=0.0,
                          attn_impl="flash", compute_dtype="bfloat16")
    tc = TrainConfig(batch_size=8, mini_batch_size=1, ctx_len=256,
                     token_budget=1e9, save_dir=os.path.join(tmp, "ck"),
                     save_name="m")
    trainer = Trainer(cfg, tc, batch_iter=iter(()))
    return trainer.save_checkpoint(final=True)


def main():
    import tempfile

    import jax

    platform = jax.devices()[0].platform
    tmp = tempfile.mkdtemp()
    ckpt = _flash_checkpoint(tmp)
    results = []
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        from omnibiote_tpu.evals.gue import run_gue
        t0 = time.time()
        gue = run_gue(sp_dir=SP, model_dir=ckpt, banned_token=65533,
                      gue_dir=_make_gue_tree(os.path.join(tmp, "GUE")),
                      pretraining_epochs=1, pretraining_num_accum_steps=2,
                      batch_size=8, pretraining_lr=1e-3,
                      finetuning_lr=1e-3, output_suffix="tpu", seed=0)
        task, r = next(iter(gue.items()))
        task = os.path.relpath(task, tmp)
        results.append({
            "task": f"GUE {task} (synthetic motif)",
            "metric": "MCC", "value": round(float(r["mcc"]), 4),
            "wall_s": round(time.time() - t0, 1),
            "attn_impl": "flash",
        })

        from omnibiote_tpu.evals.proteinglue import run_proteinglue
        t0 = time.time()
        pg = run_proteinglue(
            sp_dir=SP, model_dir=ckpt,
            eval_dir=_make_pglue_dir(os.path.join(tmp, "ProteinGLUE")),
            output_suffix="tpu", tasks=["SS3"], num_epochs=4, batch_size=8,
            seed=0, force_clean=True)
        results.append({
            "task": "ProteinGLUE SS3 (synthetic, token-level)",
            "metric": "ACC", "value": round(float(pg["SS3"]), 4),
            "wall_s": round(time.time() - t0, 1),
            "attn_impl": "flash",
        })
    finally:
        os.chdir(cwd)

    out = {"platform": platform, "results": results}
    print(json.dumps(out))
    with open(os.path.join(HERE, "EVAL_TPU.json"), "w") as f:
        json.dump(out, f, indent=2)
    assert platform != "cpu", "smoke must run on the TPU device"
    assert results[0]["value"] > 0.3 and results[1]["value"] > 0.36


if __name__ == "__main__":
    main()
