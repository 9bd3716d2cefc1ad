"""Persistent XLA compilation cache (jax_compilation_cache_dir).

Every cold bench/train process previously paid the full XLA compile —
BENCH_SCALE.json recorded warmup_s 452.5 at the reference-default config
and 393.3 at 541M (r4 VERDICT weak #3). The reference never compiles (eager
torch), so its startup cost is zero; matching that at the framework level
means persisting compiled executables across processes.

One call near process start (before the first jit lowers) points JAX at an
on-disk cache keyed by (HLO, compile options, backend version). Defaults:

  * dir:   $OBT_COMPILE_CACHE, else ~/.cache/omnibiote_tpu/xla_cache
  * off:   OBT_COMPILE_CACHE=0 (or "")
  * floor: cache every computation taking >= 1s to compile (the default
    jax floor of 60s would skip most of our step functions on CPU smokes)

Wired into training/cli.py and all bench drivers (bench.py, bench_longctx,
bench_production, tools/scale_probe.py).
"""
from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None,
                         min_compile_time_s: float = 1.0) -> str | None:
    """Enable the persistent compilation cache; returns the dir (or None
    when disabled via OBT_COMPILE_CACHE=0/empty). Safe to call more than
    once and before/after jax import (config keys are process-global)."""
    env = os.environ.get("OBT_COMPILE_CACHE")
    if env is not None and env in ("", "0"):
        return None
    path = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "omnibiote_tpu", "xla_cache")
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_s)
    # cache regardless of how the executable was produced (some backends
    # mark results "non-persistable" only for autotuning reasons)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except AttributeError:  # older jax without the knob
        pass
    return path
