"""Docstring-citation checker: every `/root/reference/<path>[:N[-M]]`
cited anywhere in this repo must point at a file (or directory) that
actually exists, with any line range inside the file's real length.

Citations are part of this repo's review discipline (CLAUDE.md): the
judge checks parity claims against the reference by following them, so
a fabricated path is worse than no citation.  Run standalone
(`python tools/check_citations.py`, exit 1 on any bad citation) — also
wrapped as a pytest in tests/test_citations.py so the suite keeps it
true.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
CITE = re.compile(r"/root/reference/([A-Za-z0-9_./-]*[A-Za-z0-9_-])(?::(\d+)(?:-(\d+))?)?")

SCAN_DIRS = ["scheduler_spark", "tests", "tools"]
SCAN_FILES = ["__spark_entry__.py", "bench.py", "README.md", "SURVEY.md"]


def iter_sources():
    for d in SCAN_DIRS:
        yield from (REPO / d).rglob("*.py")
    for f in SCAN_FILES:
        p = REPO / f
        if p.exists():
            yield p


def check() -> list[str]:
    errors: list[str] = []
    line_counts: dict[Path, int] = {}
    for src in iter_sources():
        text = src.read_text(errors="replace")
        for lineno, line in enumerate(text.splitlines(), 1):
            for m in CITE.finditer(line):
                target = Path("/root/reference") / m.group(1)
                where = f"{src.relative_to(REPO)}:{lineno}"
                if not target.exists():
                    errors.append(f"{where}: cited path does not exist: {target}")
                    continue
                if m.group(2) and target.is_file():
                    if target not in line_counts:
                        line_counts[target] = len(
                            target.read_text(errors="replace").splitlines()
                        )
                    n = line_counts[target]
                    hi = int(m.group(3) or m.group(2))
                    if hi > n:
                        errors.append(
                            f"{where}: line ref {m.group(0)} beyond EOF ({n} lines)"
                        )
    return errors


if __name__ == "__main__":
    errs = check()
    for e in errs:
        print(e)
    print(f"check_citations: {len(errs)} bad citation(s)")
    sys.exit(1 if errs else 0)
