"""Wrap-procedure check (VERDICT r12 directive #2, third recurrence of
the untracked-artifact nit): fail loudly if any driver artifact the
judge reads — CORRECTNESS_r*.json, BENCH_r*.json, BENCH_DETAIL.json,
COPYCHECK.json, LEAKCHECK.json — exists on disk but is not tracked by
git. Run this before (or as part of) every end-of-round wrap commit:

    python tools/wrap_check.py          # exit 1 + list if anything untracked
    python tools/wrap_check.py --fix    # git add the stragglers instead
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PATTERNS = (
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "BENCH_DETAIL.json",
    "COPYCHECK.json",
    "LEAKCHECK.json",
)


def untracked_artifacts() -> list[str]:
    tracked = set(
        subprocess.run(
            ["git", "ls-files"], cwd=REPO, capture_output=True, text=True
        ).stdout.splitlines()
    )
    missing = []
    for pat in PATTERNS:
        for path in sorted(glob.glob(os.path.join(REPO, pat))):
            rel = os.path.relpath(path, REPO)
            if rel not in tracked:
                missing.append(rel)
    if not missing:
        return []
    # respect .gitignore: COPYCHECK/LEAKCHECK are deliberately ignored
    # (the driver regenerates them every round)
    ignored = set(
        subprocess.run(
            ["git", "check-ignore", "--", *missing],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.splitlines()
    )
    return [rel for rel in missing if rel not in ignored]


def main() -> int:
    missing = untracked_artifacts()
    if not missing:
        print("wrap_check: all driver artifacts tracked")
        return 0
    if "--fix" in sys.argv[1:]:
        subprocess.run(["git", "add", "--", *missing], cwd=REPO, check=True)
        print(f"wrap_check: git-added {len(missing)}: {' '.join(missing)}")
        return 0
    print(
        "wrap_check: UNTRACKED driver artifacts (judge reads these — "
        "add them to the wrap commit):"
    )
    for rel in missing:
        print(f"  {rel}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
