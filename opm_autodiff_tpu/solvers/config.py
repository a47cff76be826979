"""Linear-solver configuration: canned names + JSON property trees.

Rebuild of the reference's ``--linear-solver-configuration`` handling
(setupPropertyTree.cpp:36-120): the canned names ilu0 / cpr /
cpr_trueimpes / cpr_quasiimpes / amg, or a ``.json`` file in the
reference's property-tree shape::

    {"solver": "bicgstab", "tol": 1e-2, "maxiter": 200,
     "preconditioner": {"type": "cpr", ...}}

The reference's preconditioner zoo maps onto this framework's
TPU-native preconditioners:

  ILU0 / ParOverILU0  -> zline   (exact block-Thomas down each column —
                                  the strong TPU smoother; ILU triangular
                                  solves do not vectorize on TPU)
  cpr / cprt / amg    -> cpramg  (two-stage CPR with the geometric-
                                  multigrid coarse pressure solve)
  Jac                 -> jacobi
"""

from __future__ import annotations

import dataclasses
import json


_PRECOND_MAP = {
    # "ilu0" resolves per layout inside _make_precond: zline block-
    # Thomas on banded grids, Chow-Patel block-ILU0 on the BSR path
    "ilu0": "ilu0",
    "paroverilu0": "ilu0",
    "ilun": "ilu0",
    "jac": "jacobi",
    "gs": "jacobi",
    "sor": "jacobi",
    "cpr": "cpramg",
    "cpr_quasiimpes": "cpramg",
    # cprt / cpr_trueimpes: weights from the storage Jacobian
    # (reference: setupPropertyTree.cpp cpr_trueimpes)
    "cprt": "cpramgt",
    "cpr_trueimpes": "cpramgt",
    "amg": "cpramg",
    "kamg": "cpramg",
    "famg": "cpramg",
    # native names pass through
    "zline": "zline",
    "jacobi": "jacobi",
    "cpramg": "cpramg",
    "cpramgt": "cpramgt",
}


def linear_solver_overrides(conf: str) -> dict:
    """NewtonParams field overrides for a configuration name/file.

    Accepts the reference's canned names, this framework's native
    preconditioner names, or a path ending in .json."""
    if conf.endswith(".json"):
        with open(conf) as f:
            tree = json.load(f)
        out = {}
        if "tol" in tree:
            out["linear_tol"] = float(tree["tol"])
        if "maxiter" in tree:
            out["linear_maxiter"] = int(tree["maxiter"])
        if "solver" in tree:
            out["linear_method"] = {"bicgstab": "bicgstab",
                                    "gmres": "fgmres",
                                    "flexgmres": "fgmres",
                                    "loopsolver": "bicgstab"}.get(
                str(tree["solver"]).lower(), "bicgstab")
        # reference setup-reuse ladder (ISTLSolverEbos.hpp:401-426):
        # any nonzero reuse level maps to our per-substep reuse
        if "reuse_setup" in tree:
            out["linear_setup_reuse"] = ("substep"
                                         if int(tree["reuse_setup"])
                                         else "never")
        prec = tree.get("preconditioner")
        if isinstance(prec, dict):
            ptype = str(prec.get("type", "ilu0")).lower()
        elif prec is not None:
            ptype = str(prec).lower()
        else:
            ptype = None
        if ptype is not None:
            if ptype not in _PRECOND_MAP:
                raise ValueError(f"unknown preconditioner {ptype!r}")
            out["linear_precond"] = _PRECOND_MAP[ptype]
        return out
    name = conf.lower()
    if name in ("cpr", "cprt", "cpr_trueimpes", "cpr_quasiimpes", "amg"):
        # reference: CPR configs cap the outer Krylov at 20 iterations
        # (setupPropertyTree.cpp:70-76)
        return {"linear_precond": _PRECOND_MAP[name],
                "linear_maxiter": 20}
    if name in _PRECOND_MAP:
        return {"linear_precond": _PRECOND_MAP[name]}
    raise ValueError(
        f"{conf!r} is not a valid linear-solver configuration; use "
        f"ilu0, cpr, cpr_trueimpes, cpr_quasiimpes, amg, a native name "
        f"(zline/jacobi/cpr/cpramg), or a .json file")


def apply_to_params(params, conf: str):
    """Return a NewtonParams with the configuration applied."""
    return dataclasses.replace(params, **linear_solver_overrides(conf))
