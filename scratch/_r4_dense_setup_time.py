"""Round-4: time the dense_setup components (complex_matrix / f64 inv /
upload) for the level-2 coarse inverse at 128^2."""

import faulthandler; faulthandler.dump_traceback_later(240, exit=True)
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deflatedmlmc_schwinger_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.cplx import CP

cfg = set_params("schwinger128")
t0 = time.time()
op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                      dtype=np.complex64)
hier = setup_hierarchy(op, cfg)
jax.block_until_ready(hier.coarsest_inv.re)
print(f"setup {time.time()-t0:.1f}s", flush=True)
op2 = hier.levels[2].op
print(type(op2).__name__, flush=True)
t0 = time.time()
M = op2.complex_matrix()
print(f"complex_matrix {time.time()-t0:.1f}s shape {M.shape}", flush=True)
t0 = time.time()
Minv = np.linalg.inv(M)
print(f"inv {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
d = CP(jnp.asarray(Minv.real.astype(np.float32)),
       jnp.asarray(Minv.imag.astype(np.float32)))
jax.block_until_ready(d.re)
print(f"upload {time.time()-t0:.1f}s", flush=True)

# exact-levels phase pieces
from deflatedmlmc_schwinger_tpu.trace.mlmc import bblock_matrix, exact_difference_trace

t0 = time.time()
B2 = bblock_matrix(hier, 2)
print(f"bblock_matrix(2) {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
t2 = exact_difference_trace(hier, 2, True, True, Af_inv=Minv)
print(f"exact_difference_trace(2) {time.time()-t0:.1f}s -> {t2:.6f}", flush=True)
