"""Unit tests for the .prm deck parser and typed parameters (SURVEY §2.1)."""

import pytest

from softx_2020_200_tpu.core.prm import parse_prm
from softx_2020_200_tpu.core.parameters import (
    SimulationParameters, TimeSteppingMethod, BoundaryType)

CAVITY_DECK = """
# Lethe-style deck (reference schema) — lid-driven cavity
subsection simulation control
  set method            = steady
  set output name       = cavity
  set number mesh adapt = 2
end

subsection FEM
  set velocity order = 1
  set pressure order = 1
end

subsection physical properties
  set kinematic viscosity = 0.0025   # Re = 400
end

subsection mesh
  set type               = dealii
  set grid type          = hyper_cube
  set grid arguments     = 0 : 1 : false
  set initial refinement = 5
end

subsection boundary conditions
  set number = 3
  subsection bc 0
    set id   = 0
    set type = noslip
  end
  subsection bc 1
    set id   = 1
    set type = noslip
  end
  subsection bc 2
    set id   = 2
    set type = function
    subsection u
      set Function expression = 1
    end
    subsection v
      set Function expression = 0
    end
  end
end

subsection non-linear solver
  set tolerance      = 1e-8
  set max iterations = 10
end

subsection linear solver
  set method            = gmres
  set relative residual = 1e-4
end
"""


def test_parse_nested_deck():
    deck = parse_prm(CAVITY_DECK)
    sc = deck.sub("simulation control")
    assert sc.get_str("method") == "steady"
    assert sc.get_int("number mesh adapt") == 2
    bc2 = deck.sub("boundary conditions").sub("bc 2")
    assert bc2.get_str("type") == "function"
    assert bc2.sub("u").get_str("Function expression") == "1"
    # comment stripping on a value line
    assert deck.sub("physical properties").get_double("kinematic viscosity") == 0.0025


def test_line_continuation_and_errors():
    deck = parse_prm("subsection a\n  set k = 1 + \\\n 2\nend\n")
    assert deck.sub("a").get_str("k") == "1 + 2"
    with pytest.raises(ValueError):
        parse_prm("subsection a\n")          # unterminated
    with pytest.raises(ValueError):
        parse_prm("end\n")                    # stray end
    with pytest.raises(ValueError):
        parse_prm("set novalue\n")            # set without '='


def test_typed_parameters_parse():
    p = SimulationParameters.from_text(CAVITY_DECK, dim=2)
    assert p.simulation_control.method is TimeSteppingMethod.steady
    assert p.simulation_control.number_mesh_adaptation == 2
    assert p.physical_properties.kinematic_viscosity == 0.0025
    assert p.fem.velocity_order == 1
    assert p.mesh.grid_type == "hyper_cube"
    assert p.mesh.initial_refinement == 5
    assert len(p.boundary_conditions.bcs) == 3
    assert p.boundary_conditions.bcs[2].type is BoundaryType.function
    assert p.boundary_conditions.bcs[2].u == "1"
    assert p.nonlinear_solver.tolerance == 1e-8
    assert p.linear_solver.relative_residual == 1e-4


def test_defaults_without_deck():
    p = SimulationParameters.from_text("", dim=3)
    assert p.simulation_control.method is TimeSteppingMethod.steady
    assert p.fem.n_quadrature_points_1d == 2
    assert p.initial_conditions.uvwp.count(";") == 3  # 4 components in 3D


def test_deck_roundtrip_dump():
    deck = parse_prm(CAVITY_DECK)
    text = deck.dump()
    deck2 = parse_prm(text)
    assert deck2.to_dict() == deck.to_dict()
