"""Example drivers (reference: examples.py:13-51)."""

from __future__ import annotations

import time
from typing import Dict

from deflatedmlmc_schwinger_tpu.config import TraceConfig
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.reporting import print_post_results, result_to_json


def EXAMPLE_001(cfg: TraceConfig) -> Dict:
    """Compute tr(A^{-1}) with deflated Hutchinson (reference: examples.py:13-29)."""
    from deflatedmlmc_schwinger_tpu.trace import hutchinson

    print("\n----------------------------------------------------------")
    print("Example 01 : computing tr(A^{-1}) with deflated Hutchinson")
    print("----------------------------------------------------------\n")
    op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                          dtype=cfg.complex_dtype())
    start = time.time()
    result = hutchinson(op, cfg)
    print(f"Total Hutchinson time = {time.time()-start} seconds\n")
    print_post_results(cfg, result, "hutchinson")
    print(result_to_json(cfg, result, "hutchinson"))
    return result


def EXAMPLE_002(cfg: TraceConfig) -> Dict:
    """Compute tr(A^{-1}) with deflated MG-MLMC (reference: examples.py:35-51)."""
    from deflatedmlmc_schwinger_tpu.trace import mlmc

    print("\n-------------------------------------------")
    print("Example 02 : computing tr(A^{-1}) with MLMC")
    print("-------------------------------------------\n")
    op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                          dtype=cfg.complex_dtype())
    start = time.time()
    result = mlmc(op, cfg)
    print(f"Total MLMC time = {time.time()-start} seconds")
    print_post_results(cfg, result, "mlmc")
    print(result_to_json(cfg, result, "mlmc"))
    return result
