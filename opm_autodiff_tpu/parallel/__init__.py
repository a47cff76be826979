from opm_autodiff_tpu.parallel.mesh import (cell_sharding,  # noqa: F401
                                            make_mesh, shard_problem)
