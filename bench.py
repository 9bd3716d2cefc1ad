"""Benchmark: omnibiote-small MLM pretraining throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tokens/sec/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); the driver-set target is
>=50% MFU on the training step, so vs_baseline = achieved_MFU / 0.50.
FLOPs/token uses the reference's own analytic formula 6N + 12*L*d*T
(train_encoder.py:360) against the TPU generation peak.
"""
import json
import os
import time

import numpy as np


def main():
    # Fail fast with an explicit JSON line if the TPU relay is unreachable.
    # Device discovery blocks inside the plugin's C layer (SIGALRM can't
    # interrupt it), so probe in a disposable subprocess under a timeout;
    # otherwise the driver records a bare timeout instead of a diagnosable
    # artifact.
    import subprocess
    import sys

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=int(os.environ.get("BENCH_DISCOVERY_TIMEOUT_S", "180")),
            capture_output=True)
        ok = probe.returncode == 0
        why = probe.stderr.decode()[-300:]
    except subprocess.TimeoutExpired:
        ok, why = False, "device discovery timed out"
    if not ok:
        print(json.dumps({
            "metric": "tokens_per_sec_per_chip", "value": 0,
            "unit": "tokens/sec/chip", "vs_baseline": 0,
            "error": f"device discovery failed: {why}",
        }))
        return

    # Discovery succeeded, but the relay can still hang mid-run (observed:
    # multi-hour outages). A watchdog prints the best-known partial JSON and
    # exits rather than losing the whole artifact to a driver timeout: before
    # the training measurement that is an error line; after it, the real
    # throughput number with the serving probes marked hung.
    import threading

    state = {"partial": {
        "metric": "tokens_per_sec_per_chip", "value": 0,
        "unit": "tokens/sec/chip", "vs_baseline": 0,
        "error": "relay hung before the training measurement completed",
    }, "done": False}
    lock = threading.Lock()

    def _emit(payload):
        with lock:
            if state["done"]:
                return
            state["done"] = True
            print(json.dumps(payload), flush=True)

    def _watchdog():
        # default sits below the queue/driver-side `timeout 1800` wrappers so
        # the partial JSON always lands before an external SIGTERM
        time.sleep(int(os.environ.get("BENCH_TOTAL_TIMEOUT_S", "1500")))
        _emit(state["partial"])
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    # Persistent XLA compile cache: a cold run through the remote-compile
    # relay pays minutes of compile; a warm one, seconds (r4 VERDICT weak #3).
    from omnibiote_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax

    import omnibiote_tpu as obt
    from omnibiote_tpu.config import TrainConfig
    from omnibiote_tpu.training.train import Trainer
    from omnibiote_tpu.training.metrics import (
        flops_per_token, flops_per_token_executed, mfu)
    from omnibiote_tpu.models.omnibiota import num_params
    from omnibiote_tpu.ops.segments import segment_ids_np

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")

    # omnibiote-small: 8L / 1024d / 8h, ctx 1024 (README.md:63)
    ctx = 1024
    mini = int(os.environ.get("BENCH_MINI_BATCH", "16"))
    accum = int(os.environ.get("BENCH_ACCUM", "2"))
    batch = mini * accum * n_dev

    def make_cfg(gelu):
        return obt.OmniBioTAConfig(
            n_layer=8, n_embd=1024, n_head=8, block_size=ctx,
            vocab_size=2 ** 16, dropout=0.1, attn_impl="flash",
            compute_dtype="bfloat16", gelu=gelu,
            fused_ce=os.environ.get("BENCH_FUSED_CE", "0") == "1")

    train_cfg = TrainConfig(
        batch_size=batch, mini_batch_size=mini, ctx_len=ctx,
        token_budget=float(batch * ctx * 10000), seed=0)

    rng = np.random.default_rng(0)

    def batches():
        while True:
            toks = rng.integers(20, 65000, size=(batch, ctx)).astype(np.int32)
            # sprinkle EOS so segment masking is exercised
            for r in range(batch):
                pos = rng.integers(32, ctx, size=3)
                toks[r, pos] = obt.EOS_TOKEN
            yield {"tokens": toks, "segments": segment_ids_np(toks)}

    # GELU policy: env override, else a short measured A/B (fast polynomial
    # vs exact erf) so the recorded number always uses the winner on THIS
    # hardware — the two are parity-equivalent under bf16 (DESIGN.md §6).
    gelu_policy = os.environ.get("BENCH_GELU", "")
    gelu_ab = None
    if not gelu_policy:
        if platform == "tpu":
            import gc

            def _probe(gelu, steps=6):
                tr = Trainer(make_cfg(gelu), train_cfg,
                             batch_iter=batches(), prefetch=2)
                for _ in range(2):
                    m = tr.train_step_once()
                float(m["loss"])
                t0 = time.time()
                for _ in range(steps):
                    m = tr.train_step_once()
                float(m["loss"])
                dt = time.time() - t0
                tr.close()
                del tr
                gc.collect()
                return steps * batch * ctx / dt

            gelu_ab = {g: round(_probe(g), 1) for g in ("fast", "erf")}
            gelu_policy = max(gelu_ab, key=gelu_ab.get)
        else:
            gelu_policy = "auto"

    model_cfg = make_cfg(gelu_policy)

    # prefetch=2: staging (host assembly + sharded device_put) runs ahead in
    # the background thread, same as the production CLI path
    trainer = Trainer(model_cfg, train_cfg, batch_iter=batches(), prefetch=2)

    # Warmup: value fetch (not block_until_ready) is what actually flushes
    # compile + execution through the remote TPU relay.
    for _ in range(3):
        m = trainer.train_step_once()
    float(m["loss"])

    # 50-step window (r4 VERDICT weak #6): the persistent compile cache
    # reclaimed the warmup budget, so the measurement window doubles.
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    t0 = time.time()
    for _ in range(steps):
        m = trainer.train_step_once()
    float(m["loss"])  # single sync at the end
    dt = time.time() - t0
    # synthetic batches carry no PAD; every position is a trained token
    tokens = steps * batch * ctx

    tps = tokens / dt
    tps_chip = tps / n_dev
    n_body = num_params(trainer.params, non_embedding=True)
    fpt = flops_per_token(n_body, model_cfg.n_layer, model_cfg.n_embd, ctx)
    achieved_mfu = mfu(tps, fpt, n_chips=n_dev, generation=gen)
    # dual reporting (r4 VERDICT #2): `mfu` uses the reference's nominal
    # formula (comparable to the reference's own telemetry); mfu_executed
    # counts only FLOPs actually launched — the compacted MLM head and the
    # segment-skipped attention tiles of THIS batch distribution (3 EOS/row)
    # are not credited. metrics.flops_per_token_executed documents the rules.
    s_rng = np.random.default_rng(1234)
    s_toks = s_rng.integers(20, 65000, size=(batch, ctx)).astype(np.int32)
    for r in range(batch):
        s_toks[r, s_rng.integers(32, ctx, size=3)] = obt.EOS_TOKEN
    fpt_exec = flops_per_token_executed(
        n_body, model_cfg.n_layer, model_cfg.n_embd, ctx,
        segments=segment_ids_np(s_toks))
    mfu_exec = mfu(tps, fpt_exec, n_chips=n_dev, generation=gen)

    # the headline number is now safe: if a serving probe hangs, the
    # watchdog emits this instead of nothing
    state["partial"] = {
        "metric": "omnibiote-small MLM pretrain tokens/sec/chip (ctx 1024, bf16)",
        "value": round(tps_chip, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(achieved_mfu / 0.50, 4),
        "detail": {"mfu": round(achieved_mfu, 4),
                   "mfu_executed": round(mfu_exec, 4),
                   "flops_ratio_e": round(fpt_exec / fpt, 4),
                   "platform": platform,
                   "tpu_gen": gen, "n_devices": n_dev, "gelu": gelu_policy,
                   "gelu_ab_tokens_per_sec": gelu_ab, "global_batch": batch,
                   "steps": steps, "flops_per_token": fpt,
                   "error": "relay hung during the serving probes"},
    }

    # encode() seqs/sec at ctx 1024 (BASELINE.md metric 2)
    import jax.numpy as jnp
    from omnibiote_tpu import encode
    enc_cfg = model_cfg.replace(dropout=0.0)
    enc_batch = jnp.asarray(
        rng.integers(20, 65000, size=(mini * 2, ctx)).astype(np.int32))
    enc = jax.jit(lambda p, t: encode(p, enc_cfg, t, "mean"))
    float(enc(trainer.params, enc_batch)[0, 0])  # compile + flush
    enc_steps = 16
    t0 = time.time()
    out = enc_batch
    for _ in range(enc_steps):
        e = enc(trainer.params, enc_batch)
    float(e[0, 0])
    enc_sps = enc_steps * enc_batch.shape[0] / (time.time() - t0)

    # int8 serving path: quantized projections; attention stays bf16 —
    # the int8 attention kernel measured SLOWER on this chip (K=128 dots
    # are latency-bound; see ops/int8_attention.py and DESIGN.md §6)
    from omnibiote_tpu.ops.quant import quantize_for_inference
    q_params = quantize_for_inference(trainer.params, enc_cfg)
    q_cfg = enc_cfg.replace(qkv_prepermuted=True)
    enc_q = jax.jit(lambda p, t: encode(p, q_cfg, t, "mean"))
    eq = enc_q(q_params, enc_batch)
    float(eq[0, 0])
    t0 = time.time()
    for _ in range(enc_steps):
        eq = enc_q(q_params, enc_batch)
    float(eq[0, 0])
    enc_sps_int8 = enc_steps * enc_batch.shape[0] / (time.time() - t0)
    a = np.asarray(e, np.float64).ravel()
    b = np.asarray(eq, np.float64).ravel()
    int8_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    _emit({
        "metric": "omnibiote-small MLM pretrain tokens/sec/chip (ctx 1024, bf16)",
        "value": round(tps_chip, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(achieved_mfu / 0.50, 4),
        "detail": {
            "mfu": round(achieved_mfu, 4),
            "mfu_executed": round(mfu_exec, 4),
            "flops_ratio_e": round(fpt_exec / fpt, 4),
            "encode_seqs_per_sec_ctx1024": round(enc_sps, 1),
            "encode_seqs_per_sec_ctx1024_int8": round(enc_sps_int8, 1),
            "int8_vs_bf16_cosine": round(int8_cos, 5),
            "platform": platform,
            "tpu_gen": gen,
            "n_devices": n_dev,
            "gelu": gelu_policy,
            "gelu_ab_tokens_per_sec": gelu_ab,
            "global_batch": batch,
            "steps": steps,
            "flops_per_token": fpt,
        },
    })


if __name__ == "__main__":
    main()
