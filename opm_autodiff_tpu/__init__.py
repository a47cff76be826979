"""opm_autodiff_tpu — a TPU-native fully-implicit black-oil reservoir simulator.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of OPM Flow
(reference: OPM/opm-simulators, the opm-autodiff lineage). The reference's
element-loop + pointer-sparse BCRS design becomes dense per-cell batched
arrays + static face lists with fixed topology, so every report-step shape
compiles once. Forward-mode AD (the reference's opm-material
``Evaluation<Scalar, N>`` type) is realized with ``jax.jacfwd`` + ``vmap``.

Everything is SI internally; unit conversion happens at deck parse and at
output (mirroring opm-common's unit system).
"""

import jax

# Reservoir simulation needs f64 accumulation (pressures ~1e7 Pa, mass-balance
# tolerance 1e-6): enable x64 globally, mirroring the reference's all-double
# numerics. The linear-solver offers an f32 inner path for TPU speed.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from opm_autodiff_tpu.simulator import (Simulator,  # noqa: E402,F401
                                        SimulatorOptions, run_deck)
from opm_autodiff_tpu.io.state import load_state  # noqa: E402,F401
