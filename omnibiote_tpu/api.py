"""High-level convenience API: strings in, embeddings out.

The reference exposes encode() on token ids only (README.md:26-43 shows the
user tokenizing by hand). This wraps tokenizer + padding + pooling so a
reference user can switch with less ceremony:

    import omnibiote_tpu as obt
    from omnibiote_tpu.api import Encoder

    enc = Encoder.from_checkpoint("checkpoints/omnibiota",
                                  tokenizer="mixed")
    embs = enc.encode_sequences(["<DNA>ACGT...", "<protein>MKV..."],
                                method="mean")
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import BANNED_TOKEN, OmniBioTAConfig
from .models.omnibiota import encode, forward
from .evals.common import pad_batch, tokenize_sequences


class Encoder:
    """Checkpointed model + tokenizer, batched string encoding."""

    def __init__(self, params, cfg: OmniBioTAConfig, sp,
                 banned_tokens: Sequence[int] = (), quantize: bool = False,
                 quantize_attention: bool = False, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis for
        multi-chip serving — each encode batch's rows are sharded over the
        axis (weights replicated), so throughput scales with chips while
        results stay identical to single-device encode (tests/test_api.py).
        Short final chunks are padded up to the shard count and trimmed.

        quantize=True converts the weights to the int8 serving format
        (ops/quant.py): ~1.2x encode throughput on a v5e at cosine >=0.999
        vs the bf16 path.

        quantize_attention=True additionally runs attention itself in int8
        (ops/int8_attention.py). Off by default: measured on a v5e at ctx
        1024 the int8 attention kernel is SLOWER than the bf16 flash kernel
        (67 vs 102 TF/s) — the K=128 score dots are latency-bound, so the
        int8 MXU's 2x rate never materialises while the in-kernel
        quantization adds VPU work. Kept for shapes/chips where it wins."""
        if quantize_attention and not quantize:
            raise ValueError(
                "quantize_attention=True requires quantize=True (the int8 "
                "attention kernel consumes the quantized weight format); "
                "it was previously ignored silently (r4 review)")
        if quantize:
            from .ops.quant import quantize_for_inference
            params = quantize_for_inference(params, cfg)
            cfg = cfg.replace(qkv_prepermuted=True,
                              attn_int8=quantize_attention)
        self.mesh = mesh
        self.n_data = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axes = dict(zip(mesh.axis_names, mesh.devices.shape))
            self.n_data = int(axes.get("data", 1))
            self._row_sharding = NamedSharding(mesh, P("data"))
            params = jax.device_put(params, NamedSharding(mesh, P()))
        self.params = params
        self.cfg = cfg.replace(dropout=0.0)
        self.sp = sp
        self.banned = list(banned_tokens)
        self._jit_cache = {}

    @classmethod
    def from_checkpoint(cls, path: str, tokenizer: str = "mixed",
                        tokenizer_path: Optional[str] = None,
                        quantize: bool = False, mesh=None):
        from .tokenizer import SentencePieceProcessor, load_reference
        from .training.checkpoint import load_model_checkpoint

        params, cfg = load_model_checkpoint(path)
        sp = (SentencePieceProcessor(tokenizer_path) if tokenizer_path
              else load_reference(tokenizer))
        # the banned-id table describes the REFERENCE tokenizers only: in a
        # custom vocab (tokenizer_path) that id may be a legitimate piece,
        # and stripping it would silently corrupt every token stream
        # (r4 review)
        banned = ([BANNED_TOKEN[tokenizer]]
                  if tokenizer_path is None and tokenizer in BANNED_TOKEN
                  else [])
        return cls(params, cfg, sp, banned, quantize=quantize,
                   mesh=mesh)

    def _encode_fn(self, method: str, masked: bool):
        key = (method, masked)
        if key not in self._jit_cache:
            if masked:
                # padding-aware: PAD positions masked out of attention and
                # excluded from mean/max pooling
                def fn(params, tokens, segments, lengths):
                    emb = forward(params, self.cfg, tokens,
                                  segment_ids=segments, deterministic=True,
                                  return_embeddings=True)
                    T = tokens.shape[1]
                    valid = (jnp.arange(T)[None, :] <
                             lengths[:, None])[..., None]
                    if method == "mean":
                        return (jnp.sum(emb * valid, 1)
                                / jnp.maximum(lengths[:, None], 1))
                    if method == "first":
                        return emb[:, 0]
                    if method == "last":
                        idx = jnp.maximum(lengths - 1, 0)
                        return jnp.take_along_axis(
                            emb, idx[:, None, None].repeat(
                                emb.shape[-1], -1), 1)[:, 0]
                    if method == "max":
                        neg = jnp.where(valid, emb, -jnp.inf)
                        return jnp.max(neg, 1)
                    return emb
            else:
                def fn(params, tokens, segments, lengths):
                    return encode(params, self.cfg, tokens, method)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def encode_sequences(self, sequences: List[str], method: str = "mean",
                         batch_size: int = 32, bucket: int = 128,
                         mask_padding: bool = True) -> np.ndarray:
        """Tokenize, pad, and pool. mask_padding=True keeps PAD positions
        out of attention and pooling (the reference's bare encode() lets
        padding leak into the statistics, model.py:256-278); set False for
        bit-faithful reference behaviour."""
        if method not in ("mean", "first", "last", "max"):
            # 'all' (per-position embeddings) can't concatenate across
            # bucketed chunks; an unknown string previously fell through
            # the masked path to full (B, T, D) output (r4 review)
            raise ValueError(
                f"unknown pooling {method!r}: encode_sequences supports "
                "mean/first/last/max (for per-position embeddings call "
                "obt.encode(params, cfg, tokens, 'all') directly)")
        toks = tokenize_sequences(self.sp, sequences,
                                  banned_tokens=self.banned)
        fn = self._encode_fn(method, mask_padding)
        outs = []
        for i in range(0, len(toks), batch_size):
            chunk = toks[i:i + batch_size]
            x, seg = pad_batch(chunk, bucket, self.cfg.block_size)
            lengths = np.asarray([min(len(t), x.shape[1]) for t in chunk],
                                 np.int32)
            n_rows = len(chunk)
            if self.n_data > 1:
                # multi-chip serving: rows shard over the 'data' axis; a
                # short final chunk is padded by repeating row 0 (trimmed
                # below) so every shard gets equal rows
                pad = -n_rows % self.n_data
                if pad:
                    x = np.concatenate([x, np.repeat(x[:1], pad, 0)])
                    seg = np.concatenate([seg, np.repeat(seg[:1], pad, 0)])
                    lengths = np.concatenate(
                        [lengths, np.repeat(lengths[:1], pad)])
                x = jax.device_put(x, self._row_sharding)
                segments = (jax.device_put(seg, self._row_sharding)
                            if mask_padding else None)
                lengths = jax.device_put(lengths, self._row_sharding)
            else:
                x = jnp.asarray(x)
                segments = jnp.asarray(seg) if mask_padding else None
                lengths = jnp.asarray(lengths)
            out = fn(self.params, x, segments, lengths)
            outs.append(np.asarray(out, np.float32)[:n_rows])
        return np.concatenate(outs) if outs else np.zeros((0, self.cfg.n_embd))


def iter_fasta(path):
    """Yield (record_id, sequence) from a FASTA file (.gz transparent).

    Minimal generic reader for the encode CLI: id is the first
    whitespace-delimited token after '>', sequence lines are concatenated
    verbatim (no case folding — the tokenizers are case-sensitive). The
    corpus-scale incremental parser lives in preprocessing/uniprot.py;
    this one additionally keeps record ids, which the npz output maps
    row-for-row to embeddings."""
    import gzip

    opener = gzip.open if str(path).endswith(".gz") else open
    rid, parts = None, []
    with opener(path, "rt") as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if rid is not None:
                    yield rid, "".join(parts)
                header = line[1:].strip()
                rid = header.split()[0] if header else ""
                parts = []
            elif line and rid is not None:
                parts.append(line)
    if rid is not None:
        yield rid, "".join(parts)


def main(argv: Optional[Sequence[str]] = None) -> int:
    """FASTA -> pooled-embeddings CLI (an extension: the reference README
    shows hand-written tokenize/encode snippets only, README.md:26-43).

        python -m omnibiote_tpu.api \
            --checkpoint checkpoints/omnibiota --fasta seqs.fa.gz \
            --tag protein --out embeddings.npz

    Writes an .npz with `ids` (N,) and `embeddings` (N, n_embd) float32,
    row-aligned with the FASTA record order."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m omnibiote_tpu.api",
        description="Encode FASTA sequences to pooled embeddings (.npz).")
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint directory (meta.json + npz)")
    ap.add_argument("--fasta", required=True, help="input FASTA (.gz ok)")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--method", default="mean",
                    choices=["mean", "first", "last", "max"])
    ap.add_argument("--tag", default="none",
                    choices=["protein", "dna", "none"],
                    help="modality tag prepended to every sequence "
                         "(<protein>/<DNA>), matching pretraining corpus "
                         "tagging")
    ap.add_argument("--tokenizer", default="mixed",
                    help="reference tokenizer name (mixed/peptide/"
                         "nucleotide) when --tokenizer-path is not given")
    ap.add_argument("--tokenizer-path", default=None,
                    help="explicit .model file (e.g. a CLI-trained vocab)")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--bucket", type=int, default=128,
                    help="pad lengths up to a multiple of this (fewer "
                         "compiled shapes)")
    ap.add_argument("--chunk", type=int, default=4096,
                    help="sequences held in memory per encode call")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 serving weights (ops/quant.py)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each encode batch's rows over all devices "
                         "(a 'data' mesh axis); results identical to "
                         "single-device")
    ap.add_argument("--leaky-padding", action="store_true",
                    help="bit-faithful reference pooling: padding leaks "
                         "into mean/max statistics (model.py:256-278)")
    args = ap.parse_args(argv)

    mesh = None
    if args.data_parallel:
        from .parallel.mesh import make_mesh
        mesh = make_mesh()
    enc = Encoder.from_checkpoint(args.checkpoint, tokenizer=args.tokenizer,
                                  tokenizer_path=args.tokenizer_path,
                                  quantize=args.quantize, mesh=mesh)
    prefix = {"protein": "<protein>", "dna": "<DNA>", "none": ""}[args.tag]

    ids: List[str] = []
    chunks: List[np.ndarray] = []
    buf: List[str] = []

    def flush():
        if buf:
            chunks.append(enc.encode_sequences(
                buf, method=args.method, batch_size=args.batch_size,
                bucket=args.bucket, mask_padding=not args.leaky_padding))
            buf.clear()

    for rid, seq in iter_fasta(args.fasta):
        ids.append(rid)
        buf.append(prefix + seq)
        if len(buf) >= args.chunk:
            flush()
    flush()

    emb = (np.concatenate(chunks) if chunks
           else np.zeros((0, enc.cfg.n_embd), np.float32))
    np.savez(args.out, ids=np.asarray(ids), embeddings=emb)
    print(f"wrote {emb.shape[0]} embeddings (dim {emb.shape[1]}) "
          f"to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
