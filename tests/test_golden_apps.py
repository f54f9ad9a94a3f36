"""Golden application tests (the reference's applications_tests tier —
SURVEY.md §4): run the real CLI on a small deck, capture the trimmed
stdout ('subsection test' mode), and compare against a stored .output
file with a numeric-fuzzy diff (the numdiff replacement).

Regenerate expectations after an intentional behavior change with:
    REGEN_GOLDEN=1 python -m pytest tests/test_golden_apps.py
"""

import io
import os
import re
import contextlib

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
_NUM = re.compile(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?")


def numdiff(actual: str, expected: str, rtol=2e-3, atol=1e-8):
    """Fuzzy-compare two outputs: identical text modulo numeric drift."""
    a_lines = [ln for ln in actual.strip().splitlines() if ln.strip()]
    e_lines = [ln for ln in expected.strip().splitlines() if ln.strip()]
    assert len(a_lines) == len(e_lines), \
        f"line count {len(a_lines)} != {len(e_lines)}\n--- actual ---\n" \
        + actual
    for la, le in zip(a_lines, e_lines):
        ta = _NUM.sub("#", la)
        te = _NUM.sub("#", le)
        assert ta == te, f"text mismatch:\n  {la}\n  {le}"
        na = [float(x) for x in _NUM.findall(la)]
        ne = [float(x) for x in _NUM.findall(le)]
        for va, ve in zip(na, ne):
            assert va == pytest.approx(ve, rel=rtol, abs=atol), \
                f"numeric drift {va} vs {ve} in line:\n  {la}"


def run_deck(name: str, dim: int, tmp_path) -> str:
    from softx_2020_200_tpu.apps.common import run_app
    deck = os.path.join(GOLDEN_DIR, name + ".prm")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            rc = run_app(dim, [deck])
    finally:
        os.chdir(cwd)
    assert rc == 0
    return buf.getvalue()


def check_golden(name: str, dim: int, tmp_path):
    out = run_deck(name, dim, tmp_path)
    path = os.path.join(GOLDEN_DIR, name + ".output")
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(path):
        with open(path, "w") as fh:
            fh.write(out)
        pytest.skip(f"regenerated golden output {path}")
    with open(path) as fh:
        numdiff(out, fh.read())


def test_golden_couette_gls(tmp_path):
    check_golden("couette_gls", 2, tmp_path)


def test_golden_mms_bdf2(tmp_path):
    check_golden("mms_bdf2", 2, tmp_path)
