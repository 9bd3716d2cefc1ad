"""Single source of truth for README's artifact-backed headline numbers.

Each claim is (label, regex-with-one-capture-group, expected-string): the
capture group in README.md must equal the string derived from the cited
checked-in JSON artifact. Consumed by BOTH:

  * tests/test_docs_artifacts.py — fails when README and the artifacts
    de-synchronise (r3 VERDICT weak #4);
  * tools/sync_readme.py — mechanically rewrites README from the
    artifacts, so the TPU queue can refresh an artifact and keep the
    README/test green in the same commit.
"""
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _artifact(name):
    d = json.loads((ROOT / name).read_text())
    return d.get("parsed", d)


def _fmt_thousands(x):
    return f"{int(round(x)):,}"


def _fmt_pct1(frac):
    return f"{frac * 100:.1f}"


def _fmt_k1(x):
    return f"{x / 1000:.1f}k"


def claims():
    r03 = _artifact("BENCH_r03.json")
    r02 = _artifact("BENCH_r02.json")
    r01 = _artifact("BENCH_r01.json")
    prod = _artifact("BENCH_PROD.json")
    lctx = {row["ctx"]: row
            for row in _artifact("BENCH_LONGCTX.json")["rows"]}

    # (label, regex with ONE capture group, expected string)
    yield ("headline tokens/sec (BENCH_r03)",
           r"\| \*\*([\d,]+) tokens/sec/chip\*\* \(BENCH_r03\.json\)",
           _fmt_thousands(r03["value"]))
    yield ("headline MFU (BENCH_r03)",
           r"formula vs chip peak\) \| \*\*([\d.]+)%\*\*",
           _fmt_pct1(r03["detail"]["mfu"]))
    yield ("round-1 MFU (BENCH_r01)",
           r"round 1: ([\d.]+)%", _fmt_pct1(r01["detail"]["mfu"]))
    yield ("round-2 MFU (BENCH_r02)",
           r"round 2: ([\d.]+)%", _fmt_pct1(r02["detail"]["mfu"]))
    yield ("production tokens/sec (BENCH_PROD)",
           r"\| ([\d,]+) tok/s \([\d.]+% MFU / [\d.]+% executed, "
           r"BENCH_PROD\.json\)",
           _fmt_thousands(prod["value"]))
    yield ("production MFU (BENCH_PROD)",
           r"\| [\d,]+ tok/s \(([\d.]+)% MFU / [\d.]+% executed, "
           r"BENCH_PROD\.json\)",
           _fmt_pct1(prod["detail"]["mfu"]))
    yield ("production executed MFU (BENCH_PROD)",
           r"\| [\d,]+ tok/s \([\d.]+% MFU / ([\d.]+)% executed, "
           r"BENCH_PROD\.json\)",
           _fmt_pct1(prod["detail"]["mfu_executed"]))
    for ctx in (2048, 4096, 8192, 16384):
        row = lctx[ctx]
        yield (f"ctx-{ctx} tokens/sec (BENCH_LONGCTX)",
               rf"ctx {ctx}: ([\d.]+k)(?: tok/s)? \(",
               _fmt_k1(row["tokens_per_sec_chip"]))
        yield (f"ctx-{ctx} MFU (BENCH_LONGCTX)",
               rf"ctx {ctx}: [\d.]+k(?: tok/s)? \(\*\*([\d.]+)%\*\*",
               _fmt_pct1(row["mfu"]))
        yield (f"ctx-{ctx} executed MFU (BENCH_LONGCTX)",
               rf"ctx {ctx}: [\d.]+k(?: tok/s)? \(\*\*[\d.]+%\*\*"
               rf"(?: MFU)? / ([\d.]+)% executed",
               _fmt_pct1(row["mfu_executed"]))
    yield ("encode bf16 seqs/sec (BENCH_r03 detail)",
           r"\| ([\d.]+) seqs/sec/chip \(bf16\)",
           f"{r03['detail']['encode_seqs_per_sec_ctx1024']:g}")
    yield ("encode int8 seqs/sec (BENCH_r03 detail)",
           r"\*\*([\d.]+)\*\* with int8 projections",
           f"{r03['detail']['encode_seqs_per_sec_ctx1024_int8']:g}")
    scale = {row["label"].split("-")[0]: row
             for row in _artifact("BENCH_SCALE.json")["rows"]}
    yield ("ref-default tokens/sec (BENCH_SCALE)",
           r"global batch 1024 \| ([\d.]+k) tok/s",
           _fmt_k1(scale["ref"]["tokens_per_sec"]))
    yield ("ref-default MFU (BENCH_SCALE)",
           r"global batch 1024 \| [\d.]+k tok/s, \*\*([\d.]+)%\*\* MFU",
           _fmt_pct1(scale["ref"]["mfu"]))
    yield ("ref-default executed MFU (BENCH_SCALE)",
           r"global batch 1024 \| [\d.]+k tok/s, \*\*[\d.]+%\*\* MFU / "
           r"([\d.]+)% executed",
           _fmt_pct1(scale["ref"]["mfu_executed"]))
    yield ("541M tokens/sec (BENCH_SCALE)",
           r"\| 541M \(12L/1536d\) \| ([\d.]+k) tok/s",
           _fmt_k1(scale["mid"]["tokens_per_sec"]))
    yield ("541M MFU (BENCH_SCALE)",
           r"\| 541M \(12L/1536d\) \| [\d.]+k tok/s, \*\*([\d.]+)%\*\* MFU",
           _fmt_pct1(scale["mid"]["mfu"]))
    yield ("541M executed MFU (BENCH_SCALE)",
           r"\| 541M \(12L/1536d\) \| [\d.]+k tok/s, \*\*[\d.]+%\*\* MFU / "
           r"([\d.]+)% executed",
           _fmt_pct1(scale["mid"]["mfu_executed"]))
    yield ("1.07B tokens/sec (BENCH_SCALE)",
           r"16 GB chip \| ([\d.]+k) tok/s",
           _fmt_k1(scale["big"]["tokens_per_sec"]))
    yield ("1.07B global batch (BENCH_SCALE)",
           r"16 GB chip \| [\d.]+k tok/s at the reference's global batch "
           r"(\d+)",
           str(scale["big"]["global_batch"]))
    yield ("1.07B MFU (BENCH_SCALE)",
           r"16 GB chip \| [\d.]+k tok/s[^|]*?\*\*([\d.]+)%\*\* MFU",
           _fmt_pct1(scale["big"]["mfu"]))
    yield ("1.07B executed MFU (BENCH_SCALE)",
           r"16 GB chip \| [\d.]+k tok/s[^|]*?\*\*[\d.]+%\*\* MFU / "
           r"([\d.]+)% executed",
           _fmt_pct1(scale["big"]["mfu_executed"]))
    conv = _artifact("CONVERGENCE.json")
    syn, real = conv["synthetic"], conv["real"]
    yield ("convergence synthetic first loss (CONVERGENCE)",
           r"val probes\) \| synthetic motif corpus \(plumbing proof\): "
           r"loss ([\d.]+) →",
           f"{syn['first_loss']:.4f}")
    yield ("convergence synthetic final loss (CONVERGENCE)",
           r"val probes\) \| synthetic motif corpus \(plumbing proof\): "
           r"loss [\d.]+ → ([\d.]+);",
           f"{syn['final_loss']:.4f}")
    yield ("convergence real first loss (CONVERGENCE)",
           r"real ProNAB protein/DNA/RNA sequences: loss ([\d.]+) →",
           f"{real['first_loss']:.4f}")
    yield ("convergence real final loss (CONVERGENCE)",
           r"real ProNAB protein/DNA/RNA sequences: "
           r"loss [\d.]+ → ([\d.]+) \(CONVERGENCE\.json\)",
           f"{real['final_loss']:.4f}")
