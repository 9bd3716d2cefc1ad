"""Single-config training-throughput probe (one JSON line to stdout).

Parametrized over model dims / ctx / micro-batch / accumulation / memory
levers so tools/scale_bench.py can drive one subprocess per config row
(two full-size trainers in one process would exceed the 16 GB HBM).

Usage:
  python tools/scale_probe.py --layers 12 --embd 1536 --heads 12 --ctx 1024 \
      --mini 8 --accum 32 [--moment-dtype bfloat16] [--grad-dtype bfloat16] \
      [--remat 1] [--remat-policy dots] [--steps 6] [--warmup 2]

MFU per the reference's own analytic 6N + 12*L*d*T estimate
(/root/reference/training/train_encoder.py:360) with N = non-embedding
params, against the TPU generation nominal peak.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, required=True)
    ap.add_argument("--embd", type=int, required=True)
    ap.add_argument("--heads", type=int, required=True)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--mini", type=int, default=8)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--moment-dtype", default="float32")
    ap.add_argument("--grad-dtype", default="float32")
    ap.add_argument("--remat", type=int, default=0)
    ap.add_argument("--remat-policy", default="full")
    ap.add_argument("--scan-layers", type=int, default=0)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--gelu", default="auto")
    ap.add_argument("--attn", default="flash",
                    help="attention impl; CPU smokes need 'xla' when remat "
                         "is on (interpret-mode Pallas adds an ordered IO "
                         "effect jax.checkpoint rejects; compiled TPU "
                         "kernels have no such effect)")
    ap.add_argument("--label", default="")
    ap.add_argument("--sync", type=int, default=0,
                    help="block_until_ready + print wall time per step "
                         "(diagnosing per-step overhead distribution)")
    args = ap.parse_args()

    from omnibiote_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    # CPU smoke escape hatch: the session sitecustomize force-selects the
    # axon TPU platform via jax.config (env JAX_PLATFORMS alone is
    # overridden), which hangs when the relay is down — the same counter
    # tests/conftest.py applies
    if os.environ.get("SCALE_PROBE_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["SCALE_PROBE_PLATFORM"])
    import omnibiote_tpu as obt
    from omnibiote_tpu.config import TrainConfig
    from omnibiote_tpu.training.train import Trainer
    from omnibiote_tpu.training.metrics import flops_per_token, mfu
    from omnibiote_tpu.models.omnibiota import num_params
    from omnibiote_tpu.ops.segments import segment_ids_np

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    model_cfg = obt.OmniBioTAConfig(
        n_layer=args.layers, n_embd=args.embd, n_head=args.heads,
        block_size=args.ctx, vocab_size=2 ** 16, dropout=args.dropout,
        attn_impl=args.attn, compute_dtype="bfloat16", gelu=args.gelu,
        checkpoint_freq=args.remat, remat_policy=args.remat_policy,
        scan_layers=bool(args.scan_layers))
    batch = args.mini * args.accum
    train_cfg = TrainConfig(
        batch_size=batch, mini_batch_size=args.mini, ctx_len=args.ctx,
        token_budget=float(batch * args.ctx * 100000), seed=0,
        moment_dtype=args.moment_dtype, grad_dtype=args.grad_dtype)

    rng = np.random.default_rng(0)

    def batches():
        while True:
            toks = rng.integers(
                20, 65000, size=(batch, args.ctx)).astype(np.int32)
            for r in range(batch):
                pos = rng.integers(32, args.ctx, size=3)
                toks[r, pos] = obt.EOS_TOKEN
            yield {"tokens": toks, "segments": segment_ids_np(toks)}

    trainer = Trainer(model_cfg, train_cfg, batch_iter=batches(), prefetch=2)
    t_init = time.time()
    for _ in range(args.warmup):
        m = trainer.train_step_once()
    float(m["loss"])  # flush compile + warmup through the relay
    compile_s = time.time() - t_init

    t0 = time.time()
    if args.sync:
        dt = 0.0
        for i in range(args.steps):
            ti = time.time()
            m = trainer.train_step_once()
            td = time.time()
            float(m["loss"])
            tf = time.time()
            print(f"step {i}: dispatch {td - ti:.3f}s, "
                  f"sync {tf - td:.3f}s, total {tf - ti:.3f}s", flush=True)
            dt += tf - ti
        loss = float(m["loss"])
    else:
        for _ in range(args.steps):
            m = trainer.train_step_once()
        loss = float(m["loss"])  # single sync at the end
        dt = time.time() - t0
    tokens = args.steps * batch * args.ctx

    tps = tokens / dt
    n_body = num_params(trainer.params, non_embedding=True)
    fpt = flops_per_token(n_body, args.layers, args.embd, args.ctx)
    # Dual MFU: the nominal formula credits the full-vocab head at every
    # position and dense T^2 attention; mfu_executed counts only launched
    # FLOPs (compacted head + segment-skip tile survival for THIS batch
    # distribution — metrics.flops_per_token_executed documents the rules).
    from omnibiote_tpu.training.metrics import flops_per_token_executed
    s_rng = np.random.default_rng(1234)
    s_toks = s_rng.integers(
        20, 65000, size=(batch, args.ctx)).astype(np.int32)
    for r in range(batch):
        s_toks[r, s_rng.integers(32, args.ctx, size=3)] = obt.EOS_TOKEN
    fpt_exec = flops_per_token_executed(
        n_body, args.layers, args.embd, args.ctx,
        segments=segment_ids_np(s_toks),
        attn_impl=args.attn)
    # Peak HBM: memory_stats() is unavailable through the axon relay (and
    # device_memory_profile() aborts the process), so report XLA's
    # compile-time allocation plan for the step — argument + temp + output
    # - alias bytes, the high-water mark the compiled program schedules
    # (Trainer.step_memory_analysis; fills r4's dead 0.0 column).
    try:
        mem = trainer.step_memory_analysis()
        peak_gb = mem["peak_hbm_bytes"] / 2 ** 30
    except Exception as e:
        print(f"step_memory_analysis failed: {e}", file=sys.stderr)
        peak_gb = 0.0
    # Persistent device residency (params, opt state, staged batches):
    # live jax.Arrays are countable from the host and bound the resident
    # baseline the step's transients stack on top of.
    live_gb = sum(x.nbytes for x in jax.live_arrays()) / 2 ** 30
    print(json.dumps({
        "label": args.label or f"{args.layers}L/{args.embd}d/{args.heads}h",
        "params_non_emb": n_body,
        "ctx": args.ctx, "mini": args.mini, "accum": args.accum,
        "global_batch": batch,
        "moment_dtype": args.moment_dtype, "grad_dtype": args.grad_dtype,
        "remat": args.remat, "remat_policy": args.remat_policy,
        "tokens_per_sec": round(tps, 1),
        "mfu": round(mfu(tps, fpt, 1, gen), 4),
        "mfu_executed": round(mfu(tps, fpt_exec, 1, gen), 4),
        "flops_ratio_e": round(fpt_exec / fpt, 4),
        "step_s": round(dt / args.steps, 3),
        "warmup_s": round(compile_s, 1),
        "peak_hbm_gb": round(peak_gb, 2),
        "live_gb": round(live_gb, 2),
        "loss": round(loss, 4),
    }))
    trainer.close()


if __name__ == "__main__":
    main()
