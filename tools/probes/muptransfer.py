"""µP LR-transfer sweep: is the optimal µP LR stable across widths?

The property the reference buys from `mup` (optimal LR transferable from a
small proxy to the full model — /root/reference/training/train_encoder.py:
144-170,195-199) had coordinate checks and 5-step dynamics parity but no
width x LR artifact (r4 VERDICT missing #4). This probe trains every
(width, lr) cell for a few hundred steps on the REAL ProNAB sequence corpus
(realcorpus.py) through the production pipeline and records final losses;
µP predicts the argmin LR column is the same for every width row.

Writes MUP_TRANSFER.json (env MUP_TRANSFER_JSON overrides the path):
  {"widths": [...], "lrs": [...], "grid": {width: {lr: final_loss}},
   "argmin": {width: lr}, ...}

One subprocess per cell (relay-hang isolation + a clean HBM slate).
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

WIDTHS = [256, 512, 1024]
# 0.3 caps the grid so the argmin is interior, not an edge artifact
LRS = [3e-3, 1e-2, 3e-2, 1e-1, 3e-1]


def run_cell(args):
    """Child: one (width, lr) training run; prints one JSON line."""
    from omnibiote_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import omnibiote_tpu as obt
    from omnibiote_tpu.config import TrainConfig
    from omnibiote_tpu.data.loader import build_pipeline
    from omnibiote_tpu.training.train import Trainer

    ctx, batch = 512, 32
    width = args.width
    mcfg = obt.OmniBioTAConfig(
        n_layer=4, n_embd=width, n_head=width // 64, block_size=ctx,
        vocab_size=2 ** 16, dropout=0.0, attn_impl="flash",
        compute_dtype="bfloat16")
    tc = TrainConfig(batch_size=batch, mini_batch_size=batch, ctx_len=ctx,
                     lr=args.lr, token_budget=float(batch * ctx * args.steps),
                     seed=0, banned_token=65533, log_every=10)
    # same seed for every cell: all runs consume the same data stream
    it, states = build_pipeline(
        args.root, ["genbank/train", "uniref100/train"], [0.2, 0.8],
        batch_size=batch, ctx_len=ctx, banned_tokens=[65533], seed=0)
    tr = Trainer(mcfg, tc, batch_iter=it, reader_states=states, prefetch=2)
    recs = []
    t0 = time.time()
    tr.run(max_steps=args.steps, on_metrics=lambda r: recs.append(r))
    dt = time.time() - t0
    tr.close()
    losses = [r["loss"] for r in recs if "loss" in r]
    k = max(1, len(losses) // 5)     # mean of the last ~20% of logs
    final = float(np.mean(losses[-k:]))
    print(json.dumps({
        "width": width, "lr": args.lr, "steps": args.steps,
        "final_loss": round(final, 4),
        "last_loss": round(float(losses[-1]), 4),
        "first_loss": round(float(losses[0]), 4),
        "diverged": bool(not np.isfinite(final)),
        "wall_s": round(dt, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--lr", type=float, default=0.0)
    ap.add_argument("--root", default="")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--widths", type=int, nargs="+", default=WIDTHS)
    ap.add_argument("--lrs", type=float, nargs="+", default=LRS)
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()
    if args.child:
        return run_cell(args)

    root = args.root or "/tmp/obt_real_corpus"
    if not os.path.isdir(os.path.join(root, "genbank", "train")):
        from realcorpus import build_real_corpus
        build_real_corpus(root)

    # Resumable: completed cells persist in a .partial.jsonl next to the
    # output so a relay hang / killed session only costs the in-flight cell.
    out = os.environ.get("MUP_TRANSFER_JSON",
                         os.path.join(REPO, "MUP_TRANSFER.json"))
    partial = out + ".partial.jsonl"
    done = {}
    if os.path.exists(partial):
        with open(partial) as f:
            for ln in f:
                try:
                    r = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if r.get("final_loss") is not None and r.get(
                        "steps") == args.steps:
                    done[(r["width"], r["lr"])] = r

    grid, rows = {}, []
    for width in args.widths:
        grid[str(width)] = {}
        for lr in args.lrs:
            if (width, lr) in done:
                rec = done[(width, lr)]
            else:
                cmd = [sys.executable, os.path.abspath(__file__), "--child",
                       "--width", str(width), "--lr", repr(lr),
                       "--root", root, "--steps", str(args.steps)]
                t0 = time.time()
                try:
                    p = subprocess.run(
                        cmd, capture_output=True, text=True,
                        timeout=args.timeout, cwd=REPO)
                    line = [l for l in p.stdout.splitlines()
                            if l.startswith("{")][-1] \
                        if p.returncode == 0 else None
                except subprocess.TimeoutExpired:
                    line = None
                if line is None:
                    rec = {"width": width, "lr": lr, "final_loss": None,
                           "error": "cell failed or timed out",
                           "wall_s": round(time.time() - t0, 1)}
                else:
                    rec = json.loads(line)
                    with open(partial, "a") as f:
                        f.write(json.dumps(rec) + "\n")
            rows.append(rec)
            grid[str(width)][repr(lr)] = rec.get("final_loss")
            print(f"width {width} lr {lr}: {rec.get('final_loss')} "
                  f"({rec.get('wall_s')}s)", flush=True)

    argmin = {}
    for width in args.widths:
        cells = {lr: grid[str(width)][repr(lr)] for lr in args.lrs
                 if grid[str(width)][repr(lr)] is not None
                 and np.isfinite(grid[str(width)][repr(lr)])}
        argmin[str(width)] = min(cells, key=cells.get) if cells else None
    payload = {
        "corpus": "real (ProNAB sequences, realcorpus.py)",
        "model": "4L, head_dim 64, ctx 512, batch 32, dropout 0",
        "steps": args.steps,
        "widths": args.widths, "lrs": args.lrs,
        "grid": grid, "argmin_lr_per_width": argmin,
        "transfer_ok": len({v for v in argmin.values()}) == 1,
        "rows": rows,
    }
    out = os.environ.get("MUP_TRANSFER_JSON",
                         os.path.join(REPO, "MUP_TRANSFER.json"))
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
