"""A/B: exact erf-GELU vs the degree-7 polynomial (cfg.gelu) on the
training step — the ~5% erf cost identified in DESIGN.md §6.

Outcome (2026-08-19, v5e, 24 steps): erf 141,533 vs fast 141,106 tok/s —
the polynomial is NOT faster at the production config (the erf VPU work
hides behind the MXU-bound dots), so 'auto' resolves to exact erf and
'fast' is an opt-in for VPU-bound configs. See DESIGN.md §6.

Run on the TPU: python tools/probes/gelubench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def run(gelu_mode, steps=24, warmup=4):
    import omnibiote_tpu as obt
    from omnibiote_tpu.config import TrainConfig
    from omnibiote_tpu.training.train import Trainer
    from omnibiote_tpu.ops.segments import segment_ids_np

    cfg = obt.OmniBioTAConfig(
        n_layer=8, n_embd=1024, n_head=8, block_size=1024,
        vocab_size=2 ** 16, dropout=0.1, attn_impl="flash",
        compute_dtype="bfloat16", gelu=gelu_mode)
    B, T, A = 16, 1024, 2
    tc = TrainConfig(batch_size=B * A, mini_batch_size=B, ctx_len=T,
                     token_budget=1e12, seed=0)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            toks = rng.integers(20, 65000, size=(B * A, T)).astype(np.int32)
            for r in range(B * A):
                toks[r, rng.integers(32, T, size=3)] = obt.EOS_TOKEN
            yield {"tokens": toks, "segments": segment_ids_np(toks)}

    tr = Trainer(cfg, tc, batch_iter=batches(), prefetch=2)
    for _ in range(warmup):
        m = tr.train_step_once()
    float(m["loss"])
    t0 = time.time()
    for _ in range(steps):
        m = tr.train_step_once()
    loss = float(m["loss"])
    dt = (time.time() - t0) / steps
    tps = B * A * T / dt
    tr.close()
    return dt, tps, loss


def main():
    # one subprocess per mode: two full trainers in one process risk HBM
    if len(sys.argv) > 1:
        dt, tps, loss = run(sys.argv[1])
        print(f"gelu={sys.argv[1]}: step {dt*1e3:.2f} ms, {tps:,.0f} tok/s, "
              f"loss {loss:.4f}", flush=True)
        return
    import subprocess
    for mode in ("erf", "fast"):
        subprocess.run([sys.executable, os.path.abspath(__file__), mode],
                       cwd="/root/repo", check=False)


if __name__ == "__main__":
    main()
