from opm_autodiff_tpu.props.fluid import FluidSystem  # noqa: F401
