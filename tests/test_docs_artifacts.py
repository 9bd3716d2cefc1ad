"""README headline numbers must quote the checked-in driver artifacts.

r3 VERDICT (weak #4): "headline numbers should quote the checked-in
artifact" — README claimed 142,472 tok/s / 80.1% MFU (an in-loop telemetry
re-run) while the driver artifact BENCH_r03.json recorded 141,861 / 79.74%.
This test pins every artifact-backed number in README's Results table to the
JSON it cites, so a doc edit (or a silent artifact regeneration) that
de-synchronises them fails CI instead of surfacing in review.

The claim spec lives in tools/readme_claims.py, shared with
tools/sync_readme.py (which rewrites README FROM the artifacts — the TPU
queue runs it after refreshing an artifact so both land in one commit).

Scope: only claims README attributes to a named artifact file. Probe-backed
numbers (e.g. the 1.8x flash-vs-XLA ablation, DESIGN.md ladder tables) are
deliberately out of scope — they are labeled as probe measurements in the
docs and have no canonical JSON to pin against.
"""
import pathlib
import re
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))
from readme_claims import claims  # noqa: E402

README = (ROOT / "README.md").read_text()


@pytest.mark.parametrize("label,pattern,expected",
                         list(claims()),
                         ids=[c[0] for c in claims()])
def test_readme_quotes_artifact(label, pattern, expected):
    m = re.search(pattern, README)
    assert m, f"README claim not found for {label} (pattern: {pattern})"
    assert m.group(1) == expected, (
        f"{label}: README says {m.group(1)!r} but the artifact says "
        f"{expected!r} — quote the checked-in JSON verbatim"
    )


def test_sync_readme_is_idempotent_on_green_docs(tmp_path):
    """tools/sync_readme.py run on a matching README changes nothing and
    finds every anchor (guards the tool against regex drift)."""
    import subprocess
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "sync_readme.py"), "--check"],
        text=True, capture_output=True)
    assert out.returncode == 0, out.stderr
    assert "0 updated, 0 missing" in out.stdout, out.stdout
