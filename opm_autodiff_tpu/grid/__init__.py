from opm_autodiff_tpu.grid.geometry import Geometry, build_geometry  # noqa: F401
