from opm_autodiff_tpu.models.blackoil import (CellStatic, PrimaryState,  # noqa: F401
                                              FLAG_SG, FLAG_RS)
from opm_autodiff_tpu.models.assembler import assemble_system  # noqa: F401
