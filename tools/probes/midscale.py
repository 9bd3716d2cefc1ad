"""TPU: omnibiote-mid (12L/1536d/12h, 541M params (440M non-embedding)) single-chip training
throughput at ctx 1024 — refresh of the round-2 69%-MFU claim."""
import time
import numpy as np

def main():
    import jax
    import omnibiote_tpu as obt
    from omnibiote_tpu.config import TrainConfig
    from omnibiote_tpu.training.train import Trainer
    from omnibiote_tpu.training.metrics import flops_per_token, mfu
    from omnibiote_tpu.models.omnibiota import num_params
    from omnibiote_tpu.ops.segments import segment_ids_np

    ctx, mini, accum = 1024, 8, 2
    cfg = obt.OmniBioTAConfig(
        n_layer=12, n_embd=1536, n_head=12, block_size=ctx,
        vocab_size=2 ** 16, dropout=0.1, attn_impl="flash",
        compute_dtype="bfloat16")
    batch = mini * accum
    tc = TrainConfig(batch_size=batch, mini_batch_size=mini, ctx_len=ctx,
                     token_budget=float(batch * ctx * 10000), seed=0)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            toks = rng.integers(20, 65000, size=(batch, ctx)).astype(np.int32)
            for r in range(batch):
                toks[r, rng.integers(32, ctx, size=3)] = obt.EOS_TOKEN
            yield {"tokens": toks, "segments": segment_ids_np(toks)}

    tr = Trainer(cfg, tc, batch_iter=batches())
    for _ in range(4):
        m = tr.train_step_once()
    float(m["loss"])
    steps = 12
    t0 = time.time()
    for _ in range(steps):
        m = tr.train_step_once()
    float(m["loss"])
    dt = time.time() - t0
    tokens = steps * batch * ctx
    n = num_params(tr.params, True)
    fpt = flops_per_token(n, cfg.n_layer, cfg.n_embd, ctx)
    print(f"params {n/1e6:.0f}M  tok/s {tokens/dt:.0f}  "
          f"mfu {mfu(tokens/dt, fpt, 1, 'v5e'):.4f}")

if __name__ == "__main__":
    main()
