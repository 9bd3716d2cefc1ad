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
