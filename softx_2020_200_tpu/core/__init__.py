"""Core runtime: configuration, time integration coefficients, control.

TPU-native equivalent of the reference's ``include/core`` layer
(SURVEY.md §2.1): deal.II ``ParameterHandler`` decks -> :mod:`.prm`,
muparser expressions -> :mod:`.expressions`, ``Parameters::*`` structs ->
:mod:`.parameters`, ``SimulationControl`` -> :mod:`.simulation_control`,
``bdf.cc``/``sdirk.cc`` -> :mod:`.bdf` / :mod:`.sdirk`.
"""

from .prm import parse_prm, ParameterDeck
from .expressions import Expression, parse_expression
from .bdf import bdf_coefficients
from .sdirk import sdirk_coefficients
