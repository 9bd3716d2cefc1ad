"""Rewrite README.md's artifact-backed numbers from the checked-in JSONs.

The inverse of tests/test_docs_artifacts.py over the SAME claim spec
(tools/readme_claims.py): for each claim, the regex's capture group in
README is replaced with the value derived from the artifact. Run by the
TPU queue right after it refreshes an artifact, so the artifact + README
land in one consistent commit and the docs test stays green.

Exit code: 0 if README already matched or was updated; 1 if a claim's
anchor text could not be found (the README prose changed — fix the regex
in readme_claims.py).
"""
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from readme_claims import ROOT, claims  # noqa: E402


def main():
    check_only = "--check" in sys.argv[1:]
    path = ROOT / "README.md"
    text = path.read_text()
    missing, changed = [], []
    for label, pattern, expected in claims():
        m = re.search(pattern, text)
        if not m:
            missing.append(label)
            continue
        if m.group(1) != expected:
            s, e = m.span(1)
            text = text[:s] + expected + text[e:]
            changed.append(f"{label}: {m.group(1)} -> {expected}")
    for c in changed:
        print("UPDATED", c)
    for label in missing:
        print("MISSING anchor:", label, file=sys.stderr)
    if changed and not check_only:
        path.write_text(text)
    print(f"{len(changed)} updated, {len(missing)} missing")
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
