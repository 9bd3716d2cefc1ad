"""Production-path benchmark: text corpus -> C++ tokenizer -> token shards
-> streaming reader/packer -> prefetch -> flash-attention MLM training.

Unlike bench.py (synthetic random tokens straight into the Trainer), this
times the SAME pipeline a real pretraining run uses, so the host-side
tokenize/pack/prefetch cost is captured. Writes BENCH_PROD.json at the repo
root (auditable artifact for the round-1 VERDICT's 118k-vs-122k gap).
"""
import json
import os
import shutil
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def build_corpus(root: str, n_docs: int = 3000, seed: int = 0):
    """Structured synthetic mixed corpus (genbank-like DNA + uniref-like
    protein), written as tagged .txt.gz exactly like preprocessing emits."""
    import gzip

    rng = np.random.default_rng(seed)
    paths = {}
    for corpus, tag, alpha in (("genbank", "DNA", "ACGT"),
                               ("uniref100", "protein", "MKVLAGIWERTYHNQS")):
        txt = []
        for _ in range(n_docs):
            n = int(rng.integers(120, 600))
            txt.append(f"<{tag}>" +
                       "".join(rng.choice(list(alpha), size=n)) + "<EOS>")
        src = os.path.join(root, f"{corpus}.txt.gz")
        with gzip.open(src, "wt") as f:
            f.write("".join(txt))
        paths[corpus] = src
    return paths


def main():
    from omnibiote_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax

    import omnibiote_tpu as obt
    from omnibiote_tpu.config import TrainConfig
    from omnibiote_tpu.data.loader import build_pipeline
    from omnibiote_tpu.preprocessing.tokenize_corpus import tokenize_to_shards
    from omnibiote_tpu.tokenizer import load_reference
    from omnibiote_tpu.training.train import Trainer
    from omnibiote_tpu.training.metrics import flops_per_token, mfu
    from omnibiote_tpu.models.omnibiota import num_params

    n_dev = len(jax.devices())
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    root = tempfile.mkdtemp(prefix="obt_prod_bench_")
    try:
        srcs = build_corpus(root)
        sp = load_reference("mixed")
        t0 = time.time()
        n_chars = 0
        for corpus, src in srcs.items():
            tokenize_to_shards([src], os.path.join(root, corpus),
                               sp, shard_tokens=2_000_000, val_fraction=0.0,
                               batch_records=512, seed=1)
            import gzip
            with gzip.open(src, "rt") as f:
                n_chars += len(f.read())
        tokenize_s = time.time() - t0

        ctx = 1024
        model_cfg = obt.OmniBioTAConfig(
            n_layer=8, n_embd=1024, n_head=8, block_size=ctx,
            vocab_size=2 ** 16, dropout=0.1, attn_impl="flash",
            compute_dtype="bfloat16")
        mini = int(os.environ.get("BENCH_MINI_BATCH", "16"))
        accum = int(os.environ.get("BENCH_ACCUM", "2"))
        batch = mini * accum * n_dev
        train_cfg = TrainConfig(
            batch_size=batch, mini_batch_size=mini, ctx_len=ctx,
            token_budget=float(batch * ctx * 10000), seed=0,
            banned_token=65533)

        batch_iter, _ = build_pipeline(
            root, ["genbank/train", "uniref100/train"], [0.8, 0.2],
            batch_size=batch, ctx_len=ctx, banned_tokens=[65533], seed=0)
        trainer = Trainer(model_cfg, train_cfg, batch_iter=batch_iter,
                          prefetch=2)

        for _ in range(3):
            m = trainer.train_step_once()
        float(m["loss"])   # flush compiles through the relay

        # 40-step window (r4 weak #6; compile cache reclaimed the warmup)
        steps = int(os.environ.get("BENCH_STEPS", "40"))
        t0 = time.time()
        for _ in range(steps):
            m = trainer.train_step_once()
        loss = float(m["loss"])  # single sync at the end
        dt = time.time() - t0
        tokens = steps * batch * ctx
        tps_chip = tokens / dt / n_dev

        n_body = num_params(trainer.params, True)
        fpt = flops_per_token(n_body,
                              model_cfg.n_layer, model_cfg.n_embd, ctx)
        # dual MFU (r4 VERDICT #2): executed fraction measured on a REAL
        # packed batch's segment ids (a fresh pipeline with the same seed
        # reproduces the training stream's first batch)
        from omnibiote_tpu.training.metrics import flops_per_token_executed
        probe_iter, _ = build_pipeline(
            root, ["genbank/train", "uniref100/train"], [0.8, 0.2],
            batch_size=batch, ctx_len=ctx, banned_tokens=[65533], seed=0)
        fpt_exec = flops_per_token_executed(
            n_body, model_cfg.n_layer, model_cfg.n_embd, ctx,
            segments=next(probe_iter)["segments"])
        result = {
            "metric": "production-path MLM tokens/sec/chip "
                      "(text->C++ tokenize->shards->pack->prefetch->train)",
            "value": round(tps_chip, 1),
            "unit": "tokens/sec/chip",
            "detail": {
                "mfu": round(mfu(tokens / dt, fpt, n_dev, gen), 4),
                "mfu_executed": round(
                    mfu(tokens / dt, fpt_exec, n_dev, gen), 4),
                "flops_ratio_e": round(fpt_exec / fpt, 4),
                "final_loss": round(loss, 4),
                "steps": steps,
                "global_batch": batch,
                "tokenize_chars_per_sec": round(n_chars / tokenize_s, 1),
                "n_devices": n_dev,
                "tpu_gen": gen,
            },
        }
        print(json.dumps(result))
        with open(os.path.join(HERE, "BENCH_PROD.json"), "w") as f:
            json.dump(result, f, indent=2)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
