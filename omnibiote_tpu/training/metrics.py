"""Metric sinks and MFU accounting.

The reference logs to wandb from rank 0 (train_encoder.py:189-191 and ~10
call sites) with hand-rolled time.time() spans. Here a pluggable sink writes
JSONL (always) and mirrors to wandb when available. Loop metrics carry the
reference's throughput/efficiency semantics (tokens/sec, an MFU-style
"efficiency", train_encoder.py:349-367); the reference's per-phase
time.time() spans (mask/forward/backward/optimizer, train_encoder.py:288-323)
have no per-step equivalent — one jit step has no host-visible phases — and
are replaced by Trainer.profile()'s device traces.

MFU uses the reference's analytic FLOPs/token formula
`6N + 12 * L * d * T` (train_encoder.py:360) against the TPU generation's
peak bf16 FLOPs instead of the A100's 312e12.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Optional

# Peak dense bf16 FLOP/s per chip.
TPU_PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,   # v5 lite
    "v5p": 459e12,
    "v6e": 918e12,
    "default": 197e12,
}


def flops_per_token(n_params_non_emb: int, n_layer: int, n_embd: int,
                    ctx_len: int) -> float:
    """Reference estimate: 6N + 12*L*d*T (train_encoder.py:360)."""
    return 6.0 * n_params_non_emb + 12.0 * n_layer * n_embd * ctx_len


def mfu(tokens_per_sec: float, fpt: float, n_chips: int = 1,
        generation: str = "default") -> float:
    peak = TPU_PEAK_FLOPS.get(generation, TPU_PEAK_FLOPS["default"])
    return tokens_per_sec * fpt / (peak * n_chips)


# --------------------------------------------------------------------------
# Executed-FLOPs accounting (r4 VERDICT next #2)
#
# The reference's nominal formula credits work this framework deliberately
# skips: (a) the full-vocab LM head at ALL positions, while training/mlm.py
# compacts it to capacity_frac*T slots; (b) dense T^2 attention, while the
# flash kernels prune fully-masked cross-segment tiles (segment-skip).
# mfu via the nominal formula therefore reads reported = true_util / e with
# e = executed/nominal — a fair apples-to-apples number vs the reference,
# but not a hardware-utilization claim. Every headline artifact reports
# BOTH: `mfu` (nominal formula) and `mfu_executed` (FLOPs actually
# launched). Recompute FLOPs are NOT credited back (in-kernel s/p rebuild
# in the fused backward, jax.checkpoint remat): mfu_executed counts
# model-useful FLOPs only, so it is a LOWER bound on raw MXU occupancy.
# --------------------------------------------------------------------------

def attention_tile_fraction(segments, block_q: int, block_kv: int) -> float:
    """Fraction of (q-block, kv-block) tiles the flash kernel executes
    under segment-skip pruning, given the batch's segment ids.

    Mirrors ops/flash_attention._seg_block_bounds exactly: a per-(batch,
    q-block) CONTIGUOUS kv-block range [lo, hi] survives whenever the
    blocks' segment-id ranges intersect; an empty intersection still costs
    one (masked) tile."""
    import numpy as np

    seg = np.asarray(segments)
    B, T = seg.shape
    nq, nk = T // block_q, T // block_kv
    qr = seg.reshape(B, nq, block_q)
    kr = seg.reshape(B, nk, block_kv)
    qmin, qmax = qr.min(-1), qr.max(-1)
    kmin, kmax = kr.min(-1), kr.max(-1)
    inter = ((kmin[:, None, :] <= qmax[:, :, None]) &
             (kmax[:, None, :] >= qmin[:, :, None]))     # (B, nq, nk)
    any_ = inter.any(-1)
    lo = np.where(any_, inter.argmax(-1), 0)
    hi = np.where(any_, nk - 1 - inter[:, :, ::-1].argmax(-1), 0)
    executed = np.where(any_, hi - lo + 1, 1)
    return float(executed.sum() / (B * nq * nk))


def flash_skip_fractions(segments):
    """(e_fwd, e_bwd) executed-tile fractions under the dispatch's measured
    block policy (ops/attention.py:113-120,176-186): forward kv blocks span
    the sequence up to T=2048 (no skip possible there — the fraction is
    then 1 by geometry), 512 beyond; backward kv blocks span up to T=1024,
    512 beyond; q blocks are 512 throughout."""
    import numpy as np

    seg = np.asarray(segments)
    T = seg.shape[1]
    bq = min(512, T)
    fwd_bkv = T if T <= 2048 else 512
    bwd_bkv = T if T <= 1024 else 512
    return (attention_tile_fraction(seg, bq, fwd_bkv),
            attention_tile_fraction(seg, bq, bwd_bkv))


def flops_per_token_executed(n_params_non_emb: int, n_layer: int,
                             n_embd: int, ctx_len: int, *,
                             vocab_size: int = 2 ** 16,
                             capacity_frac: float = 0.25,
                             segments=None,
                             attn_impl: str = "flash") -> float:
    """Executed FLOPs/token: the nominal reference estimate minus
    (a) the LM-head positions the compacted MLM head never computes
    (training/mlm.py: capacity_frac*T slots instead of T), and
    (b) the attention tiles segment-skip prunes (weighted 1/3 forward,
    2/3 backward like the nominal 12*L*d*T term's fwd:bwd split).
    `segments=None` (or a non-flash impl) credits dense attention."""
    fpt = flops_per_token(n_params_non_emb, n_layer, n_embd, ctx_len)
    fpt -= 6.0 * n_embd * vocab_size * (1.0 - capacity_frac)
    if segments is not None and attn_impl == "flash":
        e_fwd, e_bwd = flash_skip_fractions(segments)
        attn = 12.0 * n_layer * n_embd * ctx_len
        fpt -= attn * (1.0 - (e_fwd + 2.0 * e_bwd) / 3.0)
    return fpt


def detect_generation() -> str:
    """Map the runtime device kind to a TPU_PEAK_FLOPS key ('default' for
    CPU/unknown, so MFU stays well-defined in tests)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v6" in kind:
        return "v6e"
    if "v5p" in kind or ("v5" in kind and "lite" not in kind
                         and "v5e" not in kind):
        return "v5p"
    if "v5" in kind:
        return "v5e"
    if "v4" in kind:
        return "v4"
    return "default"


class JsonlSink:
    """Append-only JSONL metrics (one object per log call)."""

    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None,
                 echo: bool = False):
        self.path = path
        self._f: Optional[IO] = stream
        self.echo = echo
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")

    def log(self, record: dict):
        record = dict(record)
        record.setdefault("ts", time.time())
        line = json.dumps(record)
        if self._f is not None:
            self._f.write(line + "\n")
            self._f.flush()
        if self.echo:
            print(line, file=sys.stderr)

    def close(self):
        if self._f is not None and self.path is not None:
            self._f.close()


class WandbSink:
    """Optional wandb mirror; silently disabled when wandb is missing
    (zero-egress environments)."""

    def __init__(self, project: str = "omnibiota", enabled: bool = True):
        self._run = None
        if not enabled:
            return
        try:
            import wandb
            self._run = wandb.init(project=project)
        except Exception:
            self._run = None

    def log(self, record: dict):
        if self._run is not None:
            step = record.get("tokens")
            self._run.log(record, step=step)

    def close(self):
        if self._run is not None:
            self._run.finish()


class MultiSink:
    def __init__(self, *sinks):
        self.sinks = [s for s in sinks if s is not None]

    def log(self, record: dict):
        for s in self.sinks:
            s.log(record)

    def close(self):
        for s in self.sinks:
            s.close()
