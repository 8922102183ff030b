from deflatedmlmc_schwinger_tpu.ops.dirac import (  # noqa: F401
    TAPS,
    StencilOperator,
    stencil_matvec,
    gamma3,
    shift_rows_up,
    shift_rows_down,
)
