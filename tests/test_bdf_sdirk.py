"""BDF/SDIRK coefficient parity tests (reference: source/core/bdf.cc,
source/core/sdirk.cc — SURVEY.md §2.1).  Values checked against the
closed-form constant-step formulas and interpolation exactness."""

import numpy as np
import pytest

from softx_2020_200_tpu.core.bdf import bdf_coefficients
from softx_2020_200_tpu.core.sdirk import sdirk_coefficients


def test_bdf1_constant_dt():
    a = bdf_coefficients(1, [0.1])
    np.testing.assert_allclose(a, [10.0, -10.0], rtol=1e-12)


def test_bdf2_constant_dt():
    dt = 0.1
    a = bdf_coefficients(2, [dt, dt])
    np.testing.assert_allclose(a, [1.5 / dt, -2.0 / dt, 0.5 / dt], rtol=1e-12)


def test_bdf3_constant_dt():
    dt = 0.2
    a = bdf_coefficients(3, [dt, dt, dt])
    np.testing.assert_allclose(
        a, [11.0 / 6.0 / dt, -3.0 / dt, 1.5 / dt, -1.0 / 3.0 / dt], rtol=1e-12)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_bdf_variable_step_exactness(order):
    """BDF-k differentiates polynomials of degree k exactly, any steps."""
    rng = np.random.default_rng(0)
    dts = rng.uniform(0.05, 0.3, size=order)
    a = bdf_coefficients(order, dts)
    times = np.zeros(order + 1)
    for i in range(1, order + 1):
        times[i] = times[i - 1] - dts[i - 1]
    for deg in range(order + 1):
        u = times ** deg
        dudt = deg * times[0] ** (deg - 1) if deg > 0 else 0.0
        np.testing.assert_allclose(np.dot(a, u), dudt, atol=1e-9)


def test_bdf_rejects_bad_order():
    with pytest.raises(ValueError):
        bdf_coefficients(4, [0.1] * 4)
    with pytest.raises(ValueError):
        bdf_coefficients(2, [0.1])


def test_sdirk2_tableau():
    t = sdirk_coefficients(2, 0.1)
    g = 1.0 - 1.0 / np.sqrt(2.0)
    A = t[:, :2]
    np.testing.assert_allclose(A, [[g, 0.0], [1.0 - g, g]], rtol=1e-12)
    # consistency: row sums = c
    np.testing.assert_allclose(A.sum(axis=1), t[:, 2], rtol=1e-12)
    # final stage at t+dt
    assert t[-1, 2] == pytest.approx(1.0)


def test_sdirk3_order_conditions():
    t = sdirk_coefficients(3, 0.5)
    A = t[:, :3]
    c = t[:, 3]
    b = A[-1]  # stiffly-accurate: b = last row
    # order conditions: sum b = 1; b·c = 1/2; b·c^2 = 1/3
    assert b.sum() == pytest.approx(1.0, abs=1e-10)
    assert (b @ c) == pytest.approx(0.5, abs=1e-8)
    assert (b @ c**2) == pytest.approx(1.0 / 3.0, abs=1e-8)


@pytest.mark.slow
def test_bdf2_startup_substeps_improve_first_step():
    """`startup time scaling` sub-steps the first BDF2 step (reference
    first_iteration(), SURVEY §2.1/§3.2): the first-step L2 error must
    beat the plain order-ramp start by a clear margin."""
    from tests.test_sharded_v2 import MMS_DECK
    from softx_2020_200_tpu.core.parameters import SimulationParameters
    from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

    errs = {}
    for s_scale in (0.0, 0.4):
        deck = MMS_DECK.format(refine=2, order=2) + f"""
subsection simulation control
  set startup time scaling = {s_scale}
  set time end = 0.1
end
"""
        prm = SimulationParameters.from_text(deck, dim=2)
        s = GLSNavierStokesSolver(prm)
        u = s.run_transient(verbose=False)
        errs[s_scale] = s.l2_errors(u, 0.1)[0]
    assert errs[0.4] < 0.5 * errs[0.0], errs
