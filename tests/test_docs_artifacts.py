"""README headline numbers must quote the checked-in driver artifacts.

r3 VERDICT (weak #4): "headline numbers should quote the checked-in
artifact" — README claimed 142,472 tok/s / 80.1% MFU (an in-loop telemetry
re-run) while the driver artifact BENCH_r03.json recorded 141,861 / 79.74%.
This test pins every artifact-backed number in README's Results table to the
JSON it cites, so a doc edit (or a silent artifact regeneration) that
de-synchronises them fails CI instead of surfacing in review.

Scope: only claims README attributes to a named artifact file. Probe-backed
numbers (e.g. the 1.8x flash-vs-XLA ablation, DESIGN.md ladder tables) are
deliberately out of scope — they are labeled as probe measurements in the
docs and have no canonical JSON to pin against.
"""
import json
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
README = (ROOT / "README.md").read_text()


def _artifact(name):
    d = json.loads((ROOT / name).read_text())
    return d.get("parsed", d)


def _fmt_thousands(x):
    return f"{int(round(x)):,}"


def _fmt_pct1(frac):
    return f"{frac * 100:.1f}"


def _fmt_k1(x):
    return f"{x / 1000:.1f}k"


def _claims():
    r03 = _artifact("BENCH_r03.json")
    r02 = _artifact("BENCH_r02.json")
    r01 = _artifact("BENCH_r01.json")
    prod = _artifact("BENCH_PROD.json")
    lctx = {row["ctx"]: row for row in _artifact("BENCH_LONGCTX.json")["rows"]}

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
           r"\| ([\d,]+) tok/s \([\d.]+% MFU, BENCH_PROD\.json\)",
           _fmt_thousands(prod["value"]))
    yield ("production MFU (BENCH_PROD)",
           r"\| [\d,]+ tok/s \(([\d.]+)% MFU, BENCH_PROD\.json\)",
           _fmt_pct1(prod["detail"]["mfu"]))
    for ctx in (2048, 4096, 8192):
        row = lctx[ctx]
        yield (f"ctx-{ctx} tokens/sec (BENCH_LONGCTX)",
               rf"ctx {ctx}: ([\d.]+k)(?: tok/s)? \(",
               _fmt_k1(row["tokens_per_sec_chip"]))
        yield (f"ctx-{ctx} MFU (BENCH_LONGCTX)",
               rf"ctx {ctx}: [\d.]+k(?: tok/s)? \(\*\*([\d.]+)%\*\*",
               _fmt_pct1(row["mfu"]))
    yield ("encode bf16 seqs/sec (BENCH_r03 detail)",
           r"\| ([\d.]+) seqs/sec/chip \(bf16\)",
           f"{r03['detail']['encode_seqs_per_sec_ctx1024']:g}")
    yield ("encode int8 seqs/sec (BENCH_r03 detail)",
           r"\*\*([\d.]+)\*\* with int8 projections",
           f"{r03['detail']['encode_seqs_per_sec_ctx1024_int8']:g}")


@pytest.mark.parametrize("label,pattern,expected",
                         list(_claims()),
                         ids=[c[0] for c in _claims()])
def test_readme_quotes_artifact(label, pattern, expected):
    m = re.search(pattern, README)
    assert m, f"README claim not found for {label} (pattern: {pattern})"
    assert m.group(1) == expected, (
        f"{label}: README says {m.group(1)!r} but the artifact says "
        f"{expected!r} — quote the checked-in JSON verbatim")
