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

pytestmark = pytest.mark.slow  # physics tier: run with -m slow / full suite

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


def run_deck(name: str, dim: int, tmp_path, solver="gls",
             n_shards=None) -> str:
    from softx_2020_200_tpu.apps.common import run_app
    kw = {}
    if solver == "gd":
        from softx_2020_200_tpu.solvers.gd import GDNavierStokesSolver
        kw["solver_cls"] = GDNavierStokesSolver
    deck = os.path.join(GOLDEN_DIR, name + ".prm")
    args = [deck] + ([str(n_shards)] if n_shards else [])
    cwd = os.getcwd()
    os.chdir(tmp_path)
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            rc = run_app(dim, args, **kw)
    finally:
        os.chdir(cwd)
    assert rc == 0
    return buf.getvalue()


def check_golden(name: str, dim: int, tmp_path, solver="gls",
                 n_shards=None, out=None, golden_name=None):
    if out is None:
        out = run_deck(name, dim, tmp_path, solver=solver,
                       n_shards=n_shards)
    path = os.path.join(GOLDEN_DIR, (golden_name or name) + ".output")
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


def test_golden_gd_cavity(tmp_path):
    """GD Taylor-Hood steady cavity with wall forces (reference
    applications_tests gd tier)."""
    check_golden("gd_cavity", 2, tmp_path, solver="gd")


def test_golden_gd_mms_bdf2(tmp_path):
    """GD transient BDF2 MMS through the full gd CLI loop."""
    check_golden("gd_mms_bdf2", 2, tmp_path, solver="gd")


def test_golden_periodic_gls(tmp_path):
    """Periodic-in-x channel driven by a body force (periodic deck)."""
    check_golden("periodic_gls", 2, tmp_path)


def test_golden_kelly_steady(tmp_path):
    """Steady Kelly adaptation cycles through the CLI (adaptation deck:
    refine toward the lid corners, L2 error per cycle)."""
    check_golden("kelly_steady", 2, tmp_path)


def test_golden_restart_adaptive_dt(tmp_path):
    """CFL-adaptive-dt transient interrupted by a checkpoint: the
    restarted leg's step-by-step output is golden (reference restart
    tests continue ADAPTIVE-dt runs bitwise — SURVEY §4)."""
    run_deck("restart_adaptive_a", 2, tmp_path)
    out = run_deck("restart_adaptive_b", 2, tmp_path)
    check_golden("restart_adaptive_b", 2, tmp_path, out=out)


def test_golden_mms_bdf2_multidevice(tmp_path):
    """The SAME mms_bdf2 deck through the CLI on an 8-device shard_map
    mesh (the reference's mpirun=N application-test variants): L2 errors
    must match the single-device golden within the numdiff band."""
    out = run_deck("mms_bdf2_np8", 2, tmp_path, n_shards=8)
    check_golden("mms_bdf2_np8", 2, tmp_path, out=out)


def test_golden_sdirk_multidevice(tmp_path):
    """SDIRK22 stages through the sharded CLI loop: 8-device output ==
    1-device output (stage sequencing + time-dependent BC parity)."""
    out1 = run_deck("sdirk_np8", 2, tmp_path)
    out8 = run_deck("sdirk_np8", 2, tmp_path, n_shards=8)
    numdiff(out8, out1, rtol=1e-5, atol=1e-9)


def test_golden_adaptive_dt_multidevice(tmp_path):
    """CFL-adaptive dt in the sharded CLI: the dt sequence is driven by
    the device-resident sharded CFL reduction, so matching per-step L2
    errors mean the 8-device dt trajectory equals the 1-device one."""
    out1 = run_deck("adaptive_np8", 2, tmp_path)
    out8 = run_deck("adaptive_np8", 2, tmp_path, n_shards=8)
    numdiff(out8, out1, rtol=1e-5, atol=1e-9)


def test_golden_kelly_transient_multidevice(tmp_path):
    """Transient Kelly adaptation through the sharded CLI (gather ->
    adapt -> rebuild sharded solver on the adapted forest, with hanging
    constraints inside the SPMD step): 4-device forces == 1-device."""
    out1 = run_deck("kelly_np4", 2, tmp_path)
    out4 = run_deck("kelly_np4", 2, tmp_path, n_shards=4)
    numdiff(out4, out1, rtol=2e-3, atol=1e-7)


def test_golden_gd_mms_bdf2_sharded(tmp_path):
    """gd CLI under 8-way shard_map prints the single-device golden
    (reference ``mpirun -np N gd_navier_stokes_2d`` parity): the
    sharded inner solve is the same Newton-Krylov process, so L2
    errors agree to the golden tolerance."""
    check_golden("gd_mms_bdf2", 2, tmp_path, solver="gd", n_shards=8)


def test_golden_restart_sharded_cross_device_count(tmp_path):
    """Per-shard checkpoint files (reference parallel restart, §5.4):
    leg A runs 4-way and writes manifest + one file per shard (never
    assembling the global state on host); leg B restores 8-way from
    the same files and must print the single-device restart golden."""
    run_deck("restart_adaptive_a", 2, tmp_path, n_shards=4)
    assert (tmp_path / "restart_adaptive.shard3.npz").exists()
    assert not (tmp_path / "restart_adaptive.shard4.npz").exists()
    import numpy as np
    man = np.load(tmp_path / "restart_adaptive.npz")
    assert "u" not in man, "manifest must not hold the global field"
    out = run_deck("restart_adaptive_b", 2, tmp_path, n_shards=8)
    check_golden("restart_adaptive_b", 2, tmp_path, out=out)
