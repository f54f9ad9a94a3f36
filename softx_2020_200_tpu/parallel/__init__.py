"""Distribution: SFC element partitioning + shard_map halo exchange.

TPU-native replacement for the reference's MPI/p4est/Trilinos
distribution stack (SURVEY.md §2.5, §2.6, §5.8):

- p4est's Morton space-filling-curve cell partition  ->
  :mod:`.partition` (host-side Morton ranges over the device mesh)
- Trilinos ghosted-vector Import/Export               ->
  ``ppermute`` neighbor exchange inside ``shard_map``
- MPI_Allreduce for norms/dots                        ->
  ``lax.psum`` over the mesh axis

The whole Newton step runs as ONE SPMD program under jit: zero host
sync per Newton iteration (the BASELINE north star).
"""

from .partition import ShardLayout, partition_space
