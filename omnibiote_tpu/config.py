"""Typed configuration for the OmniBioTA TPU stack.

A single dataclass replaces the reference's three ad-hoc flag systems
(argparse in training/train_encoder.py:438-466, python-fire in evals/gue.py:371,
raw sys.argv in evals/pronab_crossval.py:19-22) and its mutable, monkey-patched
model config (training/train_encoder.py:145-153).

Field names and defaults follow the reference's OmniBioTAConfig
(/root/reference/training/model.py:183-193) and train_encoder CLI defaults.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp

# Token id conventions shared with the reference loader
# (/root/reference/training/loader.py:4-6). Note the repurposing:
# SentencePiece id 1 is "<s>" but is used as PAD; id 2 is "</s>" used as MASK.
UNK_TOKEN = 0
PAD_TOKEN = 1
MASK_TOKEN = 2
EOS_TOKEN = 3

# The spurious whitespace piece ("▁") per tokenizer, filtered at load time
# (reference train_encoder.py:63-66; verified against tokenizers/*.vocab).
BANNED_TOKEN = {
    "mixed": 65533,
    "nucleotide": 65525,
    "peptide": 65530,
}


@dataclass(frozen=True)
class OmniBioTAConfig:
    """Model configuration (reference: training/model.py:183-193).

    TPU-specific additions: compute/param dtypes, attention implementation
    selection, and the µP base shapes (the reference builds throwaway base
    n_embd=24 / delta n_embd=48 proxy models at train_encoder.py:157-166;
    here base widths are plain config fields).
    """

    block_size: int = 2048
    vocab_size: int = 2 ** 16
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 1024
    dropout: float = 0.1
    bias: bool = False
    autoregressive: bool = False
    # Activation rematerialisation: 0 = none; k > 0 remats each scanned block
    # (the reference checkpoints every k-th block via torch.utils.checkpoint,
    # model.py:243-245; under lax.scan we remat uniformly, which strictly
    # reduces memory further).
    checkpoint_freq: int = 0
    # remat policy when checkpoint_freq > 0: 'full' recomputes the whole
    # block; 'dots' saves matmul outputs and recomputes elementwise ops
    # (LN/GELU/dropout), trading HBM residual traffic for VPU recompute.
    remat_policy: str = "full"
    # lax.scan over stacked layers (fast compile) vs an unrolled python loop
    # (lets XLA schedule across layers; ~5% faster step, larger compile)
    scan_layers: bool = False

    # --- TPU-native additions -------------------------------------------
    # 'flash' = Pallas flash-attention kernel (segment-id masked);
    # 'xla'   = reference XLA dot-product attention (CPU tests / oracle).
    attn_impl: str = "flash"
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    rope_theta: float = 10000.0

    # MLM head cross-entropy: True = vocab-chunked fused CE with logits
    # recompute in the backward (ops/fused_ce.py); False = plain log_softmax
    # (XLA saves bf16 logits residuals). Semantics identical. EXPERIMENTAL /
    # memory-bound option: measured on a v5e it loses at every shape the
    # framework hits — omnibiote-small/ctx1024 68.6% vs 65.9% MFU, and in a
    # head-only f+b sweep (d=1024) plain wins 22-38% at both compacted
    # (N=4096) and dense sp-shard (N=16384) sizes for vocab 65536 AND
    # 131072 (V=131k/N=16k: 83.5 vs 115.5 ms) — the recompute-in-backward
    # never pays for itself while the (N, V) bf16 residuals still fit HBM.
    # Flip to True only when the logits residuals genuinely cannot fit
    # (vocab >= ~2^18 with dense long-context heads).
    fused_ce: bool = False

    # Inference-only: set True for parameter trees produced by
    # ops/quant.py:quantize_for_inference, whose wqkv already carries the
    # RoPE de-interleave column permutation (the per-forward gather in
    # _block is skipped).
    qkv_prepermuted: bool = False

    # GELU implementation. The reference's activation is the exact erf GELU
    # with a truncated sqrt(2) constant (model.py:23-25). 'fast' evaluates
    # an odd degree-7-in-x^2 polynomial fit of the SAME function (max |err|
    # 1.3e-4 over the clamped [-4, 4] support — an order below bf16's ~4e-3
    # resolution at |x|~1) whose autodiff backward is polynomial too (no
    # exp). On-chip A/Bs at the production config measured 'fast' no faster
    # than 'erf' (141.1k vs 141.5k tok/s — the erf VPU work hides behind the
    # MXU at these shapes), so 'auto' = exact 'erf': reference bit-behaviour
    # everywhere, with 'fast' kept for genuinely VPU-bound configs
    # (DESIGN.md §6).
    gelu: str = "auto"

    # Inference-only: run attention itself in int8 (ops/int8_attention.py —
    # int8 scores + int8 P·V on the double-rate MXU). Only takes effect on
    # deterministic forwards at lane-aligned shapes; training and any
    # non-conforming shape fall back to the bf16 flash kernel.
    attn_int8: bool = False

    # µP base widths (reference train_encoder.py:157-166). width_mult =
    # n_embd / mup_base_n_embd. Setting mup_base_n_embd == n_embd disables µP
    # scaling (width_mult == 1).
    mup_base_n_embd: int = 24
    mup_output_mult: float = 1.0

    @property
    def head_dim(self) -> int:
        assert self.n_embd % self.n_head == 0
        return self.n_embd // self.n_head

    @property
    def width_mult(self) -> float:
        return self.n_embd / self.mup_base_n_embd

    @property
    def attn_scale(self) -> float:
        # µP 1/d attention scaling, literally 8/n_embd in the reference
        # (model.py:119,125,135,141).
        return 8.0 / self.n_embd

    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    def pdtype(self):
        return jnp.dtype(self.param_dtype)

    def replace(self, **kw) -> "OmniBioTAConfig":
        return dataclasses.replace(self, **kw)


# Named model sizes used by the reference (README.md:63, proteinGLUE.py:665).
# NOTE: 'omnibiote-medium' carries the reference's *default* config values
# (model.py:185-189), whose 12 heads do not divide n_embd=1024 — the
# reference's own `assert n_embd % n_head == 0` (model.py:77) rejects it
# just as our head_dim assert does. Kept verbatim for parity; pass
# n_head=16 (or n_embd=1536) to get a usable 12-layer model.
PRESETS = {
    "omnibiote-small": dict(n_layer=8, n_embd=1024, n_head=8, block_size=1024),
    "omnibiote-medium": dict(n_layer=12, n_embd=1024, n_head=12, block_size=1024),
    "default": dict(),
}


def preset(name: str, **overrides) -> OmniBioTAConfig:
    kw = dict(PRESETS[name])
    kw.update(overrides)
    return OmniBioTAConfig(**kw)


@dataclass(frozen=True)
class TrainConfig:
    """Pretraining configuration.

    Mirrors the reference CLI (train_encoder.py:438-466) flag-for-flag, plus
    mesh/sharding fields for the TPU data-parallel path.
    """

    batch_size: int = 1024          # global batch across the whole mesh
    mini_batch_size: int = 8        # per-device micro-batch (grad accumulation)
    ctx_len: int = 2048
    lr: float = 1e-2                # µP LR; scaled by sqrt(batch_size)/32
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    weight_decay: float = 1e-2
    token_budget: float = 20e9
    test_freq: float = 1e7          # tokens between val-loss probes
    save_freq: float = 1e9          # tokens between checkpoints
    save_name: str = "omnibiota"
    save_dir: str = "checkpoints"
    force_lr: bool = False          # disable µP per-group LR scaling
    # mup MuAdamW decoupled_wd: False (mup + reference default) scales
    # matrix-like weight decay by width_mult so effective decay lr*wd is
    # uniform; True leaves decay unscaled (shrinks with the µP-reduced LR).
    mup_decoupled_wd: bool = False
    banned_token: Optional[int] = None
    warmup_period: float = 0.05     # fraction of iters for the batch ramp
    batch_ramp: bool = False
    train_type: str = "mixed"       # protein | nucleotide | mixed | halfnhalf
    use_padding: bool = False
    resume_from: int = 0            # token count to resume from
    base_dir: str = ""
    mask_prob: float = 0.15
    grad_clip: float = 1.0
    seed: int = 0

    # --- TPU-native additions -------------------------------------------
    dp_axis: str = "data"
    mesh_shape: Optional[Tuple[int, ...]] = None  # None = all devices on dp
    # 'replicated' (DDP equivalent) | 'fsdp' (ZeRO-style param/opt sharding,
    # the reference's --FSDP) | 'tp' | 'fsdp+tp' (tensor-parallel extension)
    sharding: str = "replicated"
    # PRNG implementation for training randomness: 'rbg' is much faster on
    # TPU than the default threefry (dropout mask generation is ~15% of the
    # step with threefry at dropout 0.1)
    rng_impl: str = "rbg"
    log_every: int = 1
    # Background-thread checkpoint writes: the device->host snapshot stays
    # synchronous, the multi-GB npz/disk work overlaps training.
    async_checkpoint: bool = False
    # Adam moment storage dtype ('float32' | 'bfloat16'). bf16 moments halve
    # the optimizer's HBM footprint (the lever that lets 16L/2048d (1.07B
    # params) train on one 16 GB chip: fp32 master 4.3 GB + fp32 moments
    # 8.6 GB + fp32 grads 4.3 GB alone exceed HBM). The moment UPDATE
    # always computes in fp32 — only the carried state is rounded; see
    # optim.scale_by_adam_mixed.
    moment_dtype: str = "float32"
    # Gradient dtype handed to the optimizer on the A=1 (no-accumulation)
    # path ('float32' | 'bfloat16'). bf16 grads halve the 4.3 GB (at 1.07B)
    # transient grad buffer; clip/Adam arithmetic still runs fp32.
    # Accumulating paths (A>1) always carry fp32 — summing micro-grads in
    # bf16 loses low-order bits — so this only applies when A == 1.
    grad_dtype: str = "float32"

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    @property
    def mixture(self):
        """(train_dirs, val_dirs, names, proportions) per train_type
        (reference train_encoder.py:72-93)."""
        if self.train_type == "protein":
            return (["uniref100/train"], ["uniref100/val"], ["uniref100"], [1.0])
        if self.train_type == "nucleotide":
            return (["genbank/train"], ["genbank/val"], ["genbank"], [1.0])
        if self.train_type == "mixed":
            return (["genbank/train", "uniref100/train"],
                    ["genbank/val", "uniref100/val"],
                    ["genbank", "uniref100"], [0.80, 0.20])
        if self.train_type == "halfnhalf":
            return (["genbank/train", "uniref100/train"],
                    ["genbank/val", "uniref100/val"],
                    ["genbank", "uniref100"], [0.50, 0.50])
        raise ValueError(
            "train_type must be one of 'protein', 'nucleotide', 'mixed', 'halfnhalf'")
