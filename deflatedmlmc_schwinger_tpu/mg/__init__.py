from deflatedmlmc_schwinger_tpu.mg.hierarchy import (  # noqa: F401
    DenseOperator,
    BlockProlongator,
    MGLevel,
    Hierarchy,
)
from deflatedmlmc_schwinger_tpu.mg.setup import setup_hierarchy, check_quality  # noqa: F401
from deflatedmlmc_schwinger_tpu.mg.cycle import MGSolver  # noqa: F401
