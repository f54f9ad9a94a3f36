"""FEM core: bases, quadrature, meshes, DoFs, mappings.

TPU-native replacement for the deal.II facilities the reference delegates
to (SURVEY.md §2.5): ``FE_Q``/``QGauss``/``FEValues`` become host-side
NumPy tabulations feeding batched XLA/Pallas contractions; ``DoFHandler``/
``AffineConstraints`` become integer index arrays and masks; ``MappingQ``
becomes on-the-fly isoparametric geometry evaluation.
"""

from .quadrature import gauss_legendre_1d, tensor_quadrature
from .basis import LagrangeBasis1D, TensorBasis
from .mesh import Mesh
from .dof import FESpace
