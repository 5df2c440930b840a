"""FLOPs / parameter accounting via XLA cost analysis.

Replaces ptflops + the hook-based mult-adds counter
(utils/multadds_count.py, eval.py:233-238): the compiled program itself
reports its flop count, which also captures fusion — what actually runs.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def xla_cost(fn: Callable, *example_args) -> dict:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns [dict]
        analysis = analysis[0]
    return dict(analysis or {})


def model_complexity(model, variables, input_shape: Tuple[int, ...]) -> dict:
    """(GMACs-equivalent flops, params) at a given input shape — the
    reference reports ptflops MACs at (3, 1025, 2049) (eval.py:233-238)."""
    x = np.zeros(input_shape, np.float32)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    cost = xla_cost(fwd, variables, x)
    return {
        "flops": float(cost.get("flops", -1.0)),
        "params": count_params(variables.get("params", variables)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }
