"""Pod-scale planning calculator: memory, collectives, bubble, roofline.

Multi-chip hardware is not attachable in this environment (one v5e via
the relay), so scaling decisions need a principled estimator instead of
trial-and-error. Given a model config + parallelism plan, this prints one
JSON object with:

  * per-device HBM breakdown (fp32 master, Adam moments, grad carry, bf16
    compute copy, activations with/without remat, compacted-head logits)
    and a fits/doesn't-fit verdict against the chip's HBM;
  * per-step collective volumes for the chosen sharding (dp grad
    all-reduce, fsdp param all-gather + grad reduce-scatter, tp per-layer
    all-reduces, pp ppermute traffic) and their ICI times;
  * the pipeline bubble fraction (S-1)/(M+S-1) where relevant;
  * a roofline step-time projection: max(compute, ICI) with compute
    scaled by a measured utilization factor (default 0.797 — the
    checked-in single-chip MFU from BENCH_r03.json) and stretched by the
    pp bubble. Labelled an ESTIMATE: collective/compute overlap, XLA
    scheduling, and DCN hops are not modelled.

Memory semantics mirror training/train.py + optim.py exactly: fp32
master + 2 moments (moment_dtype-sized), grad carry only when accum > 1
(grad_dtype-sized), transient bf16 compute copy (fully gathered under
fsdp for the step), activations per the remat policy in
models/omnibiota.py:316-320 / parallel/pipeline.py.

Hardware table: public figures (TPU spec sheets / the scaling book's
numbers); override any of them via flags for other parts.

Usage:
  python tools/pod_plan.py --preset omnibiote-small --chips 8 \
      --sharding fsdp --ctx 2048 --mini 8 --accum 16
  python tools/pod_plan.py --layers 16 --embd 2048 --heads 16 \
      --sharding fsdp+pp --mesh 4 2 --moment-dtype bfloat16 --remat 1
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Public per-chip figures: bf16 peak FLOP/s, HBM bytes, HBM BW, per-link
# ICI GB/s (one direction) and link count (torus degree).
HW = {
    "v4":  dict(peak=275e12, hbm=32e9, hbm_bw=1.2e12, ici_gbs=45.0, links=6),
    "v5e": dict(peak=197e12, hbm=16e9, hbm_bw=8.1e11, ici_gbs=45.0, links=4),
    "v5p": dict(peak=459e12, hbm=95e9, hbm_bw=2.8e12, ici_gbs=90.0, links=6),
    "v6e": dict(peak=918e12, hbm=32e9, hbm_bw=1.6e12, ici_gbs=90.0, links=4),
}

DTYPE_BYTES = {"float32": 4, "bfloat16": 2}


def count_params(cfg):
    """Exact parameter count via shape evaluation (no allocation)."""
    import jax
    # pure shape math — never touch the (possibly tunnelled) TPU backend;
    # env alone is insufficient under the axon sitecustomize
    jax.config.update("jax_platforms", "cpu")
    from omnibiote_tpu.models.omnibiota import init_params

    shapes = jax.eval_shape(lambda k: init_params(k, cfg),
                            jax.random.PRNGKey(0))
    total = sum(int(x.size) for x in jax.tree.leaves(shapes))
    wte = int(shapes["wte"].size)
    blocks = sum(int(x.size) for x in jax.tree.leaves(shapes["blocks"]))
    return dict(total=total, non_embedding=total - wte, wte=wte,
                blocks=blocks, other=total - wte - blocks)


def plan(cfg, *, chips, sharding, mesh, mini, accum, ctx,
         moment_dtype="float32", grad_dtype="float32", remat=0,
         hw="v5e", util=0.797, capacity_frac=0.25):
    h = HW[hw]
    p = count_params(cfg)
    P, D, L, V = p["total"], cfg.n_embd, cfg.n_layer, cfg.vocab_size
    T = ctx
    mb = DTYPE_BYTES[moment_dtype]
    gb = DTYPE_BYTES[grad_dtype]

    # ---- parallel degrees --------------------------------------------
    n_dp = n_tp = n_sp = n_pp = 1
    if sharding in ("fsdp", "replicated", "dp"):
        n_dp = chips
    elif sharding in ("tp", "fsdp+tp"):
        n_dp, n_tp = (mesh if mesh else (1, chips))
    elif sharding == "sp":
        n_dp, n_sp = (mesh if mesh else (1, chips))
    elif sharding == "pp":
        n_dp, n_pp = (mesh if len(mesh or ()) == 2 else (1, chips))
    elif sharding == "fsdp+pp":
        assert mesh is not None and len(mesh) == 2, (
            "fsdp+pp needs a 2D --mesh '(dp, pp)' (same as the trainer's "
            "mesh_shape requirement)")
        n_dp, n_pp = mesh
    assert n_dp * n_tp * n_sp * n_pp == chips, (
        f"mesh {mesh} inconsistent with --chips {chips}")

    zero = sharding in ("fsdp", "fsdp+tp", "fsdp+pp")
    # matrix weights under tp shard over model axis too (approximation:
    # norms/embeddings are a small fraction); pp shards blocks only
    block_frac = p["blocks"] / P

    # ---- per-device memory -------------------------------------------
    # pp: blocks divide by S; wte/head replicate (they stay outside the
    # stage shard). fsdp divides everything by n_dp.
    def shard_bytes(bytes_per_el):
        if n_pp > 1:
            per = (p["blocks"] / n_pp + (P - p["blocks"])) * bytes_per_el
        else:
            per = P * bytes_per_el
        if zero:
            per /= n_dp
        if n_tp > 1:
            per = per * (1 - block_frac) + per * block_frac / n_tp
        return per

    master = shard_bytes(4)
    moments = 2 * shard_bytes(mb)
    # accum > 1: a persistent grad-accumulation carry; accum == 1: the
    # transient grad tree still coexists with master+moments at the
    # optimizer-update peak, so it is counted either way
    grad_carry = shard_bytes(gb)
    # bf16 compute copy: fully gathered for the step under fsdp (the
    # all-gather target), stage-local under pp, tp keeps its shard
    compute_copy = 2 * (p["blocks"] / n_pp + (P - p["blocks"])
                        if n_pp > 1 else P)
    if n_tp > 1:
        compute_copy *= (1 - block_frac) + block_frac / n_tp

    # activations per micro (bf16): ~12 tensors of (mini, T_l, D) per
    # block survive to the backward unfused (q,k,v, attn-out, proj-out,
    # h1 (4D counts as 4), mlp-out, 2 LN, 2 residual adds)
    T_l = T // n_sp
    act_per_layer = 12 * mini * T_l * D * 2
    if remat > 0:
        # only block inputs + one block's working set
        act = L * mini * T_l * D * 2 + act_per_layer
    else:
        act = L * act_per_layer
    if n_pp > 1:
        # pipeline holds M+S-1 ticks of its Ls-layer slice (no remat) or
        # tick inputs only (remat, parallel/pipeline.py)
        M = accum
        Ls = L // n_pp
        ticks = M + n_pp - 1
        if remat > 0:
            act = ticks * mini * T_l * D * 2 + Ls * act_per_layer
        else:
            act = ticks * Ls * act_per_layer
    # compacted MLM head logits: cap = T/4 masked slots per row, bf16
    logits = mini * max(int(T * capacity_frac), 8) * V * 2 / max(n_tp, 1)

    total_mem = master + moments + grad_carry + compute_copy + act + logits
    mem = dict(
        master_fp32=master, adam_moments=moments, grad_carry=grad_carry,
        bf16_compute_copy=compute_copy, activations=act,
        head_logits=logits, total=total_mem, hbm=h["hbm"],
        fits=bool(total_mem < 0.92 * h["hbm"]),  # ~8% runtime headroom
    )

    # ---- step FLOPs / compute time ------------------------------------
    from omnibiote_tpu.training.metrics import flops_per_token
    # sp shards the T axis of the SAME rows across n_sp chips, so it does
    # not multiply the tokens processed per step
    tokens_step = mini * n_dp * accum * T
    fpt = flops_per_token(p["non_embedding"], L, D, T)
    compute_s = tokens_step * fpt / (h["peak"] * chips * util)
    bubble = (n_pp - 1) / (accum + n_pp - 1) if n_pp > 1 else 0.0
    compute_s /= max(1.0 - bubble, 1e-9)

    # ---- collective volumes per step (bytes, per device) ---------------
    ici_bw = h["ici_gbs"] * 1e9
    coll = {}
    if n_dp > 1 and not zero:
        coll["dp_grad_allreduce"] = 2 * P * gb * (n_dp - 1) / n_dp
    if zero:
        gathered = P * 2 if n_pp == 1 else (
            p["blocks"] / n_pp + (P - p["blocks"])) * 2
        coll["fsdp_param_allgather"] = gathered * (n_dp - 1) / n_dp
        # reduce-scatter moves (n-1)/n of the grad tree (gb-sized elems;
        # `gathered` is bf16 bytes, so /2 recovers the element count)
        coll["fsdp_grad_reducescatter"] = gathered / 2 * gb * \
            (n_dp - 1) / n_dp
    if n_tp > 1:
        # 2 all-reduces per layer (attn out + mlp out), fwd + bwd
        coll["tp_allreduce"] = 4 * L * (2 * mini * T_l * D * 2) \
            * (n_tp - 1) / n_tp
    if n_sp > 1:
        # ring attention: K and V circulate the full ring per layer, fwd
        # (+2x recompute/grad traffic in bwd)
        coll["sp_ring_kv"] = 3 * L * accum * 2 * mini * T_l * D * 2 \
            * (n_sp - 1)
    if n_pp > 1:
        coll["pp_ppermute"] = (accum + n_pp - 1) * 2 * \
            (mini * T_l * D * 2)   # fwd + bwd ticks
    ici_s = {k: v / ici_bw for k, v in coll.items()}
    comm_s = sum(ici_s.values())

    step_s = max(compute_s, comm_s)
    return dict(
        model=dict(layers=L, embd=D, heads=cfg.n_head, vocab=V, ctx=T,
                   params=P, non_embedding=p["non_embedding"]),
        parallel=dict(chips=chips, sharding=sharding, dp=n_dp, tp=n_tp,
                      sp=n_sp, pp=n_pp, mini=mini, accum=accum,
                      remat=remat, moment_dtype=moment_dtype,
                      grad_dtype=grad_dtype),
        memory_bytes=mem,
        flops=dict(per_token=fpt, tokens_per_step=tokens_step,
                   bubble=bubble, util_assumed=util),
        collectives_bytes=coll,
        times_s=dict(compute=compute_s, ici=comm_s, **ici_s),
        projection=dict(step_s=step_s,
                        tokens_per_sec=tokens_step / step_s,
                        bound="compute" if compute_s >= comm_s else "ici",
                        note="roofline estimate; overlap/DCN not modelled"),
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--preset", default=None)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--embd", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--vocab", type=int, default=2 ** 16)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--sharding", default="fsdp",
                    choices=["replicated", "fsdp", "tp", "fsdp+tp", "sp",
                             "pp", "fsdp+pp"])
    ap.add_argument("--mesh", type=int, nargs=2, default=None,
                    help="2D mesh shape for the composed modes")
    ap.add_argument("--mini", type=int, default=8)
    ap.add_argument("--accum", type=int, default=16)
    ap.add_argument("--remat", type=int, default=0)
    ap.add_argument("--moment-dtype", default="float32")
    ap.add_argument("--grad-dtype", default="float32")
    ap.add_argument("--hw", default="v5e", choices=sorted(HW))
    ap.add_argument("--util", type=float, default=0.797,
                    help="compute utilization factor (default: the "
                         "measured single-chip MFU, BENCH_r03.json)")
    args = ap.parse_args()

    from omnibiote_tpu.config import OmniBioTAConfig, preset
    if args.preset:
        cfg = preset(args.preset, block_size=max(args.ctx, 2048))
    else:
        cfg = OmniBioTAConfig(n_layer=args.layers, n_embd=args.embd,
                              n_head=args.heads, vocab_size=args.vocab,
                              block_size=max(args.ctx, 2048))
    out = plan(cfg, chips=args.chips, sharding=args.sharding,
               mesh=tuple(args.mesh) if args.mesh else None,
               mini=args.mini, accum=args.accum, ctx=args.ctx,
               moment_dtype=args.moment_dtype, grad_dtype=args.grad_dtype,
               remat=args.remat, hw=args.hw, util=args.util)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
