from opm_autodiff_tpu.wells.standard import (WellSet, WellResult,  # noqa: F401
                                             build_wellset,
                                             well_contributions,
                                             CTRL_BHP, CTRL_ORAT, CTRL_WRAT,
                                             CTRL_GRAT, CTRL_LRAT, CTRL_RATE)
