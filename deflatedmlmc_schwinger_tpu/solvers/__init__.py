from deflatedmlmc_schwinger_tpu.solvers.fgmres import fgmres  # noqa: F401
