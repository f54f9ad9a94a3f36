"""Matrix-free element operators, Krylov solvers, preconditioners, kernels.

This layer is the TPU-native replacement for the reference's
Trilinos/Epetra sparse linear algebra and deal.II assembly machinery
(SURVEY.md §2.5): no global sparse matrix exists anywhere — residuals and
Jacobian-vector products are batched element kernels (gather → tensor
contractions → scatter-add), Krylov solvers run in ``lax.while_loop``, and
preconditioners are batched small dense inverses.
"""

from .operators import gather_elements, scatter_add_elements, node_multiplicity
from .linalg import gmres
