"""Every reference citation in the repo must resolve (CLAUDE.md
discipline: cite file:line, never fabricate).  Wraps
tools/check_citations.py so the suite keeps the claim true."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_all_reference_citations_resolve():
    from check_citations import check

    errors = check()
    assert errors == [], "\n".join(errors)
