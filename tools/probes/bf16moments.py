"""bf16 Adam moments + bf16 grad-carry loss-curve parity vs fp32 (on-chip).

The 1.07B-on-one-16GB-chip recipe stores Adam moments, the A=1 grad buffer
AND the accumulation scan's grad carry in bfloat16
(optim.scale_by_adam_mixed, train.make_train_step). r4's only evidence that
this holds a loss curve was a 10/20-step CPU unit test
(tests/test_training.py); this probe checks in a >=200-step on-chip overlay
(r4 VERDICT next #4): same data/seed, two full runs (fp32 vs mixed), curve
recorded every 10 steps, summary = max |Δloss|/loss over the overlay.

Writes BF16_PARITY.json (env BF16_PARITY_JSON overrides).
Accumulation is ON (accum 4) so the bf16 SCAN CARRY — the newest lever —
is exercised, not just the moment storage.
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)


def run(moment_dtype, grad_dtype, root, steps):
    import omnibiote_tpu as obt
    from omnibiote_tpu.config import TrainConfig
    from omnibiote_tpu.data.loader import build_pipeline
    from omnibiote_tpu.training.train import Trainer

    ctx, mini, accum = 512, 8, 4
    batch = mini * accum
    mcfg = obt.OmniBioTAConfig(
        n_layer=4, n_embd=512, n_head=8, block_size=ctx, vocab_size=2 ** 16,
        dropout=0.0, attn_impl="flash", compute_dtype="bfloat16")
    tc = TrainConfig(batch_size=batch, mini_batch_size=mini, ctx_len=ctx,
                     lr=1e-2, token_budget=float(batch * ctx * steps),
                     seed=0, banned_token=65533, log_every=10,
                     moment_dtype=moment_dtype, grad_dtype=grad_dtype)
    it, states = build_pipeline(
        root, ["genbank/train", "uniref100/train"], [0.2, 0.8],
        batch_size=batch, ctx_len=ctx, banned_tokens=[65533], seed=0)
    tr = Trainer(mcfg, tc, batch_iter=it, reader_states=states, prefetch=2)
    assert tr.accum_slots == accum
    recs = []
    tr.run(max_steps=steps, on_metrics=lambda r: recs.append(r))
    tr.close()
    return [(r["step"], round(float(r["loss"]), 5))
            for r in recs if "loss" in r]


def main():
    steps = int(os.environ.get("BF16_PARITY_STEPS", "250"))
    from omnibiote_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    root = "/tmp/obt_real_corpus"
    if not os.path.isdir(os.path.join(root, "genbank", "train")):
        from realcorpus import build_real_corpus
        build_real_corpus(root)

    t0 = time.time()
    curve32 = run("float32", "float32", root, steps)
    curvemx = run("bfloat16", "bfloat16", root, steps)
    wall = time.time() - t0

    l32 = dict(curve32)
    lmx = dict(curvemx)
    common = sorted(set(l32) & set(lmx))
    rel = [abs(l32[s] - lmx[s]) / max(abs(l32[s]), 1e-9) for s in common]
    payload = {
        "steps": steps,
        "model": "4L/512d/8h ctx 512, accum 4 (bf16 scan carry exercised)",
        "corpus": "real (ProNAB sequences)",
        "final_loss_fp32": l32[common[-1]],
        "final_loss_bf16": lmx[common[-1]],
        "max_rel_loss_gap": round(max(rel), 5),
        "mean_rel_loss_gap": round(float(np.mean(rel)), 5),
        "wall_s": round(wall, 1),
        "curve": [{"step": s, "fp32": l32[s], "bf16": lmx[s]}
                  for s in common],
    }
    out = os.environ.get("BF16_PARITY_JSON",
                         os.path.join(REPO, "BF16_PARITY.json"))
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "curve"}))
    print("wrote", out)


if __name__ == "__main__":
    main()
