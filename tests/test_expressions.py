"""Unit tests for the muparser-compatible expression language (SURVEY §5.6)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softx_2020_200_tpu.core.expressions import (
    Expression, VectorExpression)


def ev(src, **env):
    return float(Expression(src)(**{k: jnp.asarray(v) for k, v in env.items()}))


def test_arithmetic_and_precedence():
    assert ev("1 + 2*3") == 7.0
    assert ev("(1+2)*3") == 9.0
    assert ev("2^3^2") == 512.0          # right-assoc
    assert ev("-2^2") == -4.0            # unary minus binds looser than ^
    assert ev("6/3/2") == 1.0            # left-assoc
    assert ev("1e-3 * 2") == pytest.approx(2e-3)


def test_functions_and_constants():
    assert ev("sin(pi/2)") == pytest.approx(1.0)
    assert ev("cos(0) + exp(0)") == pytest.approx(2.0)
    assert ev("sqrt(2)^2") == pytest.approx(2.0, rel=1e-6)
    assert ev("atan2(1, 1)") == pytest.approx(math.pi / 4)
    assert ev("max(3, min(10, 5))") == 5.0
    assert ev("abs(-3.5)") == 3.5


def test_conditionals_and_logic():
    assert ev("if(x > 0, 1, -1)", x=2.0) == 1.0
    assert ev("if(x > 0, 1, -1)", x=-2.0) == -1.0
    assert ev("if(x >= 0 && x <= 1, x, 0)", x=0.25) == 0.25
    assert ev("if(x < 0 || x > 1, 1, 0)", x=0.5) == 0.0


def test_variables_and_vectorization():
    e = Expression("x*y + t")
    out = e(x=jnp.arange(3.0), y=jnp.full(3, 2.0), t=1.0)
    np.testing.assert_allclose(np.asarray(out), [1.0, 3.0, 5.0])


def test_spatial_evaluation():
    pts = jnp.array([[0.0, 0.0], [1.0, 2.0], [0.5, 0.5]])
    e = Expression("x + 10*y")
    np.testing.assert_allclose(np.asarray(e.spatial(pts)), [0.0, 21.0, 5.5])
    # z defaults to 0 in 2D
    e2 = Expression("z + 1")
    np.testing.assert_allclose(np.asarray(e2.spatial(pts)), [1.0, 1.0, 1.0])


def test_vector_expression():
    ve = VectorExpression("x ; -y; 0; x*y", n_components=4)
    pts = jnp.array([[2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(ve.spatial(pts))[0],
                               [2.0, -3.0, 0.0, 6.0])


def test_traceable_under_jit():
    e = Expression("sin(pi*x) * cos(pi*y) + t")

    @jax.jit
    def f(pts, t):
        return e.spatial(pts, t)

    pts = jnp.array([[0.5, 0.0]])
    assert float(f(pts, 0.0)[0]) == pytest.approx(1.0, abs=1e-6)
    assert float(f(pts, 2.0)[0]) == pytest.approx(3.0, abs=1e-6)


def test_errors():
    with pytest.raises(ValueError):
        Expression("1 +")
    with pytest.raises(ValueError):
        Expression("foo(1)")(x=1.0)
    with pytest.raises(NameError):
        Expression("q + 1")(x=1.0)


def test_parsed_function_defaults_match_reference_semantics():
    # Lethe decks commonly write e.g. "if(y>0.999, 1, 0)" for lid BCs
    lid = Expression("if(y > 0.999, 1, 0)")
    assert float(lid(x=0.0, y=1.0)) == 1.0
    assert float(lid(x=0.0, y=0.5)) == 0.0
