"""OPERATORS.md freshness gate: the catalog is generated mechanically from
docstrings + the contract registry (tools/gen_catalog.py); this test fails
whenever an operator, docstring, or contract link changed without
regenerating — the "cannot rot" property VERDICT r04 asked for."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_operators_md_is_fresh():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_catalog.py"), "--check"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert proc.returncode == 0, (
        "OPERATORS.md is stale — run `python tools/gen_catalog.py`\n"
        + proc.stdout
        + proc.stderr
    )
