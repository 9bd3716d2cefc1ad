"""Capture a device trace of the train step and print the top op costs.

Env-parametrized (r5: used to attribute the executed-utilization gap at
the reference-default config — PROF_LAYERS=12 PROF_CTX=2048 PROF_ACCUM=16):
PROF_LAYERS, PROF_EMBD, PROF_HEADS, PROF_CTX, PROF_MINI, PROF_ACCUM,
PROF_DROPOUT, PROF_STEPS.
"""
import glob, gzip, json, os, sys
from collections import defaultdict

import numpy as np

import omnibiote_tpu as obt
from omnibiote_tpu.config import TrainConfig
from omnibiote_tpu.training.train import Trainer
from omnibiote_tpu.ops.segments import segment_ids_np
from omnibiote_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
E = os.environ.get
ctx = int(E("PROF_CTX", "1024"))
rng = np.random.default_rng(0)
mini, accum = int(E("PROF_MINI", "8")), int(E("PROF_ACCUM", "4"))
batch = mini * accum

def batches():
    while True:
        toks = rng.integers(20, 65000, size=(batch, ctx)).astype(np.int32)
        for r in range(batch):
            pos = rng.integers(32, ctx, size=3)
            toks[r, pos] = obt.EOS_TOKEN
        yield {"tokens": toks, "segments": segment_ids_np(toks)}

mcfg = obt.OmniBioTAConfig(
    n_layer=int(E("PROF_LAYERS", "8")), n_embd=int(E("PROF_EMBD", "1024")),
    n_head=int(E("PROF_HEADS", "8")), block_size=ctx, vocab_size=2**16,
    dropout=float(E("PROF_DROPOUT", "0.1")), attn_impl="flash",
    compute_dtype="bfloat16")
tcfg = TrainConfig(batch_size=batch, mini_batch_size=mini, ctx_len=ctx,
                   token_budget=float(batch * ctx * 100000), seed=0)
tr = Trainer(mcfg, tcfg, batch_iter=batches())
trace_dir = "/tmp/obt_profile"
os.system(f"rm -rf {trace_dir}")
tr.profile(n_steps=int(E("PROF_STEPS", "3")), trace_dir=trace_dir)

# Parse the chrome trace: aggregate op durations on the device track.
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
assert files, f"no trace found under {trace_dir}"
with gzip.open(files[0], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
# find device process ids (TPU/axon device tracks, not python host threads)
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

dev_pids = {p for p, n in pid_names.items()
            if ("TPU" in n or "tpu" in n or "Device" in n or "axon" in n.lower())
            and "host" not in n.lower()}
print("process tracks:", sorted(pid_names.values()), file=sys.stderr)

agg = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        d = e.get("dur", 0) / 1e3  # ms
        agg[e["name"]] += d
        cnt[e["name"]] += 1
        total += d

print(f"\ntotal device time: {total:.1f} ms over 3 steps ({total/3:.1f} ms/step)")
for name, d in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{d/3:9.2f} ms/step  x{cnt[name]//3:<4d} {name[:110]}")
