"""Checkpoint / resume of setup artifacts and estimator state.

The reference recomputes everything from scratch every run (SURVEY.md
section 5.3-5.4: no checkpointing anywhere). Here the three expensive or
stateful pieces are serializable:

  * the MG hierarchy (stencil coefficients, prolongator blocks, coarse
    operators, coarsest inverse, displacement shifts),
  * deflation bases + corrections,
  * running estimator moments + the global sample counter.

Because probes are keyed by their global sample index (trace/probes.py), an
estimation resumed from (moments, next_index) continues the EXACT same sample
stream -- mid-run resume is bitwise-consistent, and rerunning a sample shard
is idempotent.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from deflatedmlmc_schwinger_tpu.mg.hierarchy import (
    BlockProlongator,
    BlockStencilOperator,
    DenseOperator,
    Hierarchy,
    MGLevel,
    pack_grouped,
)
from deflatedmlmc_schwinger_tpu.ops.cplx import CP
from deflatedmlmc_schwinger_tpu.ops.dirac import PairStencilOperator
from deflatedmlmc_schwinger_tpu.trace.stats import RunningMoments


def _cp_to_np(p: CP) -> Tuple[np.ndarray, np.ndarray]:
    return np.asarray(p.re), np.asarray(p.im)


def _np_to_cp(re: np.ndarray, im: np.ndarray, rdtype) -> CP:
    return CP(jnp.asarray(re.astype(np.dtype(rdtype))),
              jnp.asarray(im.astype(np.dtype(rdtype))))


def save_hierarchy(hier: Hierarchy, path: str) -> None:
    arrays: Dict[str, np.ndarray] = {}
    meta: List[Dict] = []
    for i, lev in enumerate(hier.levels):
        entry = {"perm_shift": int(lev.perm_shift)}
        op = lev.op
        if isinstance(op, PairStencilOperator):
            entry["kind"] = "stencil"
            entry["nx"], entry["nt"] = op.nx, op.nt
            arrays[f"op{i}_re"], arrays[f"op{i}_im"] = _cp_to_np(op.coeffs)
        elif isinstance(op, BlockStencilOperator):
            entry["kind"] = "block_stencil"
            entry["offsets"] = list(op.offsets)
            arrays[f"op{i}_re"], arrays[f"op{i}_im"] = _cp_to_np(op.blocks)
        else:
            entry["kind"] = "dense"
            arrays[f"op{i}_re"], arrays[f"op{i}_im"] = _cp_to_np(op.mat)
        if lev.P is not None:
            arrays[f"P{i}_re"], arrays[f"P{i}_im"] = _cp_to_np(lev.P.blocks)
            entry["has_P"] = True
        else:
            entry["has_P"] = False
        meta.append(entry)
    arrays["coarsest_inv_re"], arrays["coarsest_inv_im"] = _cp_to_np(hier.coarsest_inv)
    extra = {"levels": meta}
    for name in ("poly_roots", "poly_roots_extra"):
        val = getattr(hier, name, None)
        if val is not None:
            extra[name] = [
                [[t.real, t.imag] for t in lev_roots] for lev_roots in val
            ]
    np.savez_compressed(path, __meta__=json.dumps(extra), **arrays)


def load_hierarchy(path: str, rdtype=jnp.float32) -> Hierarchy:
    with np.load(path, allow_pickle=False) as z:
        extra = json.loads(str(z["__meta__"]))
        # pre-poly_roots checkpoints stored the level list directly
        meta = extra["levels"] if isinstance(extra, dict) else extra
        def _roots(name):
            if isinstance(extra, dict) and name in extra:
                return tuple(
                    tuple(complex(re, im) for re, im in lev_roots)
                    for lev_roots in extra[name]
                )
            return None

        poly_roots = _roots("poly_roots")
        poly_roots_extra = _roots("poly_roots_extra")
        levels = []
        for i, entry in enumerate(meta):
            if entry["kind"] == "stencil":
                op = PairStencilOperator(
                    coeffs=_np_to_cp(z[f"op{i}_re"], z[f"op{i}_im"], rdtype),
                    nx=entry["nx"], nt=entry["nt"],
                )
            elif entry["kind"] == "block_stencil":
                op = pack_grouped(BlockStencilOperator(
                    blocks=_np_to_cp(z[f"op{i}_re"], z[f"op{i}_im"], rdtype),
                    offsets=tuple(entry["offsets"]),
                ))
            else:
                op = DenseOperator(mat=_np_to_cp(z[f"op{i}_re"], z[f"op{i}_im"], rdtype))
            P = None
            if entry["has_P"]:
                P = BlockProlongator(
                    blocks=_np_to_cp(z[f"P{i}_re"], z[f"P{i}_im"], rdtype)
                )
            levels.append(MGLevel(op=op, P=P, perm_shift=entry["perm_shift"]))
        coarsest_inv = _np_to_cp(z["coarsest_inv_re"], z["coarsest_inv_im"], rdtype)
    return Hierarchy(levels=tuple(levels), coarsest_inv=coarsest_inv,
                     poly_roots=poly_roots, poly_roots_extra=poly_roots_extra)


@dataclasses.dataclass
class EstimatorState:
    """Resumable sampling state: running moments + next global sample index
    (per level for MLMC; single entry for Hutchinson), plus accumulated
    solver-iteration counters so resumed runs report complexity for ALL
    samples, not just the ones solved in the current process."""

    moments: Dict[str, RunningMoments]
    next_index: Dict[str, int]
    iters: Dict[str, int] = dataclasses.field(default_factory=dict)

    def save(self, path: str) -> None:
        payload = {
            name: dict(
                count=m.count, mean_re=m.mean.real, mean_im=m.mean.imag,
                m2=m.m2, next_index=self.next_index.get(name, 0),
            )
            for name, m in self.moments.items()
        }
        payload["__iters__"] = {k: int(v) for k, v in self.iters.items()}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "EstimatorState":
        with open(path) as f:
            payload = json.load(f)
        iters = {k: int(v) for k, v in payload.pop("__iters__", {}).items()}
        moments = {}
        next_index = {}
        for name, d in payload.items():
            m = RunningMoments(
                count=int(d["count"]),
                mean=complex(d["mean_re"], d["mean_im"]),
                m2=float(d["m2"]),
            )
            moments[name] = m
            next_index[name] = int(d["next_index"])
        return cls(moments=moments, next_index=next_index, iters=iters)

    @classmethod
    def load_or_empty(cls, path: Optional[str]) -> "EstimatorState":
        if path and os.path.exists(path):
            return cls.load(path)
        return cls(moments={}, next_index={})
