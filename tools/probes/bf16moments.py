"""On-chip loss-curve overlay: bf16 Adam moments + bf16 grad carry vs fp32.

The 1.07B row in BENCH_SCALE.json trains on one 16 GB chip only because the
Adam moments, the gradients, and (r5) the accumulation-scan grad CARRY ride
in bfloat16 (training/optim.scale_by_adam_mixed, train.py accumulation
scan). The unit evidence was a 20-step CPU test
(tests/test_training.py:test_mixed_moment_and_grad_dtypes_track_fp32);
the r4 VERDICT asked for a >=200-step on-chip artifact proving the memory
recipe holds a loss curve (ref regime: accumulation, real sequences).

This probe trains the SAME model / data stream (real ProNAB corpus,
realcorpus.py) twice on the TPU — once all-fp32, once with the full big-row
memory recipe (moment_dtype=bfloat16, grad_dtype=bfloat16, accumulation so
the bf16 carry path is exercised) — and writes BF16_PARITY.json with both
curves plus tracking stats.

Env: BF16_PARITY_JSON overrides the output path; BF16_STEPS the step count.
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from omnibiote_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

import omnibiote_tpu as obt                       # noqa: E402
from omnibiote_tpu.config import TrainConfig      # noqa: E402
from omnibiote_tpu.data.loader import build_pipeline  # noqa: E402
from omnibiote_tpu.training.train import Trainer  # noqa: E402

STEPS = int(os.environ.get("BF16_STEPS", "300"))
CTX, MINI, ACCUM = 512, 4, 8          # accum > 1: the bf16 carry is live
BATCH = MINI * ACCUM

ROOT = "/tmp/obt_real_corpus"
if not os.path.isdir(os.path.join(ROOT, "genbank", "train")):
    from realcorpus import build_real_corpus
    build_real_corpus(ROOT)

MCFG = obt.OmniBioTAConfig(
    n_layer=6, n_embd=768, n_head=12, block_size=CTX, vocab_size=2 ** 16,
    dropout=0.0, attn_impl="flash", compute_dtype="bfloat16")


def run(moment_dtype, grad_dtype):
    tc = TrainConfig(
        batch_size=BATCH, mini_batch_size=MINI, ctx_len=CTX, lr=1e-2,
        token_budget=float(BATCH * CTX * STEPS), seed=0,
        banned_token=65533, log_every=1,
        moment_dtype=moment_dtype, grad_dtype=grad_dtype)
    it, states = build_pipeline(
        ROOT, ["genbank/train", "uniref100/train"], [0.2, 0.8],
        batch_size=BATCH, ctx_len=CTX, banned_tokens=[65533], seed=0)
    tr = Trainer(MCFG, tc, batch_iter=it, reader_states=states, prefetch=2)
    losses = []
    t0 = time.time()
    tr.run(max_steps=STEPS,
           on_metrics=lambda r: losses.append(r["loss"])
           if "loss" in r else None)
    dt = time.time() - t0
    tr.close()
    return losses, dt


def main():
    l32, t32 = run("float32", "float32")
    print(f"fp32: {len(l32)} steps, first {l32[0]:.4f} last {l32[-1]:.4f} "
          f"({t32:.1f}s)", flush=True)
    lmx, tmx = run("bfloat16", "bfloat16")
    print(f"bf16: {len(lmx)} steps, first {lmx[0]:.4f} last {lmx[-1]:.4f} "
          f"({tmx:.1f}s)", flush=True)

    import jax
    n = min(len(l32), len(lmx))
    a, b = np.asarray(l32[:n]), np.asarray(lmx[:n])
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-9)
    k = max(1, n // 5)
    tail32, tailmx = float(a[-k:].mean()), float(b[-k:].mean())
    payload = {
        "corpus": "real (ProNAB sequences, realcorpus.py)",
        "platform": jax.devices()[0].platform,
        "model": "6L/768d/12h, ctx 512, global batch 32 (mini 4 x accum 8)",
        "recipe_mixed": "moment_dtype=bfloat16 grad_dtype=bfloat16 "
                        "(Adam moments, grads AND the accumulation-scan "
                        "grad carry in bf16 — the BENCH_SCALE big-row "
                        "memory recipe)",
        "steps": n, "lr": 1e-2,
        "first_loss": {"fp32": float(a[0]), "bf16": float(b[0])},
        "final_loss": {"fp32": float(a[-1]), "bf16": float(b[-1])},
        "tail_mean_loss": {"fp32": round(tail32, 4),
                           "bf16": round(tailmx, 4),
                           "window": int(k)},
        "tail_rel_gap": round(abs(tail32 - tailmx) / tail32, 5),
        "max_rel_gap": round(float(rel.max()), 5),
        "mean_rel_gap": round(float(rel.mean()), 5),
        "both_converged": bool(a[-1] < a[0] and b[-1] < b[0]),
        "tracks": bool(abs(tail32 - tailmx) / tail32 < 0.02),
        "wall_s": {"fp32": round(t32, 1), "bf16": round(tmx, 1)},
        "curve_every_5": [
            {"step": i, "fp32": round(float(a[i]), 4),
             "bf16": round(float(b[i]), 4)}
            for i in range(0, n, 5)],
    }
    out = os.environ.get("BF16_PARITY_JSON",
                         os.path.join(REPO, "BF16_PARITY.json"))
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", out, "tracks =", payload["tracks"],
          "tail_rel_gap =", payload["tail_rel_gap"])


if __name__ == "__main__":
    main()
