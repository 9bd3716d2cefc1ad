"""Convergence run through the full production path (round 2; real data r5).

Corpus -> C++ tokenizer -> shards -> reader/packer/mixture -> prefetch ->
flash-attention MLM training with val probes. Validates the kernel stack
(fused-RoPE exp2 flash, searchsorted compaction, bits dropout) end-to-end:
loss must fall hard.

Two corpus modes (r4 VERDICT weak #2 / next #6):
  --corpus synthetic   motif-repeat documents (the round-2 corpus; plumbing
                       proof, loss floor reflects memorized motif structure)
  --corpus real        real protein/DNA/RNA sequences from the reference's
                       ProNAB dataset (tools/probes/realcorpus.py; the only
                       real sequence data shipped with the reference). Small
                       (~155k train tokens), so a multi-hundred-step run
                       re-visits it many times — the artifact records the
                       epoch count explicitly.
"""
import argparse
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def build_structured_corpus(root, n_docs=4000, seed=0):
    rng = np.random.default_rng(seed)
    paths = {}
    for corpus, tag, alpha in (("genbank", "DNA", "ACGT"),
                               ("uniref100", "protein", "MKVLAGIWERTYHNQS")):
        motifs = ["".join(rng.choice(list(alpha), size=int(rng.integers(8, 24))))
                  for _ in range(12)]
        txt = []
        for _ in range(n_docs):
            n_rep = int(rng.integers(6, 30))
            parts = []
            for _ in range(n_rep):
                parts.append(motifs[int(rng.integers(len(motifs)))])
                if rng.random() < 0.15:  # occasional noise char
                    parts.append(str(rng.choice(list(alpha))))
            txt.append(f"<{tag}>" + "".join(parts) + "<EOS>")
        src = os.path.join(root, f"{corpus}.txt.gz")
        with gzip.open(src, "wt") as f:
            f.write("".join(txt))
        paths[corpus] = src
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="synthetic",
                    choices=["synthetic", "real"])
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--mini", type=int, default=16)
    args = ap.parse_args()

    from omnibiote_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax

    import omnibiote_tpu as obt
    from omnibiote_tpu.config import TrainConfig
    from omnibiote_tpu.data.loader import build_pipeline
    from omnibiote_tpu.preprocessing.tokenize_corpus import tokenize_to_shards
    from omnibiote_tpu.tokenizer import load_reference

    from omnibiote_tpu.training.train import Trainer

    root = tempfile.mkdtemp(prefix="obt_conv_")
    if args.corpus == "real":
        from realcorpus import build_real_corpus
        build_real_corpus(root)
    else:
        srcs = build_structured_corpus(root)
        sp = load_reference("mixed")
        for corpus, src in srcs.items():
            tokenize_to_shards([src], os.path.join(root, corpus), sp,
                               shard_tokens=2_000_000, val_fraction=0.05,
                               batch_records=512, seed=1)
    train_tokens = sum(
        np.load(os.path.join(root, c, "train", f)).size
        for c in ("genbank", "uniref100")
        for f in os.listdir(os.path.join(root, c, "train"))
        if f.endswith(".npy"))

    ctx = 1024
    mcfg = obt.OmniBioTAConfig(
        n_layer=8, n_embd=1024, n_head=8, block_size=ctx, vocab_size=2**16,
        dropout=0.1, attn_impl="flash", compute_dtype="bfloat16")
    batch = args.batch
    tc = TrainConfig(batch_size=batch, mini_batch_size=args.mini, ctx_len=ctx,
                     lr=1e-2, token_budget=float(batch * ctx * args.steps),
                     seed=0, banned_token=65533, test_freq=6.5e6,
                     log_every=20)
    # real corpus: nucleotide data is ~6x smaller than protein (22k vs 133k
    # tokens), so the production 80/20 genbank-heavy mixture would cycle the
    # nucleotide corpus several times per BATCH; weight by availability
    proportions = [0.2, 0.8] if args.corpus == "real" else [0.8, 0.2]
    train_iter, reader_states = build_pipeline(
        root, ["genbank/train", "uniref100/train"], proportions,
        batch_size=batch, ctx_len=ctx, banned_tokens=[65533], seed=0)
    val_iters = {}
    for name in ("genbank", "uniref100"):
        vit, _ = build_pipeline(root, [f"{name}/val"], [1.0],
                                batch_size=16, ctx_len=ctx,
                                banned_tokens=[65533], seed=99)
        val_iters[name] = vit

    tr = Trainer(mcfg, tc, batch_iter=train_iter,
                 reader_states=reader_states, prefetch=2)
    recs = []
    t0 = time.time()
    tr.run(max_steps=args.steps, on_metrics=lambda r: recs.append(r),
           val_iters=val_iters)
    dt = time.time() - t0
    tr.close()

    train_recs = [r for r in recs if "loss" in r]
    print(f"\n{len(train_recs)} log records, wall {dt:.0f}s, "
          f"{tr.trained_tokens/dt/1e3:.1f}k tok/s")
    for r in train_recs[:: max(1, len(train_recs)//10)]:
        print(f"step {r['step']:4d} loss {r['loss']:7.4f} "
              f"mfu {r.get('mfu', 0):.3f}")
    print(f"final step {train_recs[-1]['step']} loss {train_recs[-1]['loss']:.4f}")
    vals = [r for r in recs if any(k.startswith("test_loss") for k in r)]
    for r in vals:
        print({k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in r.items()})

    # Checked-in artifact (CONVERGENCE.json at the repo root): the loss
    # trajectory is the round's proof that the full production path
    # (tokenize -> shards -> pack -> mixture -> prefetch -> flash MLM)
    # actually LEARNS on the device, not just runs.
    out = os.environ.get("CONVERGENCE_JSON")
    if out and not train_recs:
        # relay death mid-run can leave zero loss records; report cleanly
        # instead of crashing after the (partial) training (r4 ADVICE)
        print(f"ERROR: no loss records captured — not writing {out}")
        sys.exit(1)
    if out:
        curve = [{"step": r["step"], "loss": round(float(r["loss"]), 4)}
                 for r in train_recs[:: max(1, len(train_recs) // 20)]]
        if curve[-1]["step"] != train_recs[-1]["step"]:
            curve.append({"step": train_recs[-1]["step"],
                          "loss": round(float(train_recs[-1]["loss"]), 4)})
        payload = {
            "platform": jax.devices()[0].platform,
            "corpus": args.corpus,
            "train_corpus_tokens": int(train_tokens),
            # how many times the (small) corpus was revisited — honesty
            # label for the loss floor (memorization vs modeling)
            "corpus_epochs": round(tr.trained_tokens / max(train_tokens, 1),
                                   1),
            "steps": int(train_recs[-1]["step"]),
            "global_batch": batch, "ctx": ctx,
            "first_loss": round(float(train_recs[0]["loss"]), 4),
            "final_loss": round(float(train_recs[-1]["loss"]), 4),
            "tokens_per_sec": round(tr.trained_tokens / dt, 1),
            "wall_s": round(dt, 1),
            "val": [{k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in r.items()} for r in vals],
            "curve": curve,
        }
        # CONVERGENCE.json keys one row per corpus mode: {"synthetic": {...},
        # "real": {...}} (a legacy flat payload is migrated to "synthetic")
        merged = {}
        if os.path.exists(out):
            with open(out) as f:
                old = json.load(f)
            merged = (old if ("synthetic" in old or "real" in old)
                      else {"synthetic": old})
        merged[args.corpus] = payload
        with open(out, "w") as f:
            json.dump(merged, f, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
