"""Multi-chip parallel layer: mesh, sharded encode, collectives, training."""

from blt_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicated, row_sharding
