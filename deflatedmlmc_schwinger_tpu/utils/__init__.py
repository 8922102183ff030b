from deflatedmlmc_schwinger_tpu.utils.flops import flops_vcycle, level_nnz  # noqa: F401
from deflatedmlmc_schwinger_tpu.utils.timer import PhaseTimer  # noqa: F401
