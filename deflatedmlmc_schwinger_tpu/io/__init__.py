from deflatedmlmc_schwinger_tpu.io.matio import load_matrix, load_operator  # noqa: F401
from deflatedmlmc_schwinger_tpu.io.stencil import (  # noqa: F401
    stencil_from_csr,
    csr_from_stencil,
)
