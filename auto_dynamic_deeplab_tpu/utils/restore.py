"""Tolerant pytree restore — equivalent of utils/copy_state_dict.py (:1-17):
copy every leaf whose path+shape matches, report (not fail on) the rest.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, Any]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def copy_state_dict(
    target: Any, source: Any, verbose: bool = True
) -> Tuple[Any, Dict[str, List[str]]]:
    """Returns (updated_target, report) where report lists 'missing' (in
    target but not source), 'unexpected' (in source only) and 'mismatched'
    (present but wrong shape — kept from target)."""
    src = _flatten(source)
    report = {"missing": [], "unexpected": [], "mismatched": []}
    used = set()

    def merge(path, leaf):
        key = jax.tree_util.keystr(path)
        if key not in src:
            report["missing"].append(key)
            return leaf
        used.add(key)
        cand = src[key]
        if np.shape(cand) != np.shape(leaf):
            report["mismatched"].append(
                f"{key}: {np.shape(cand)} vs {np.shape(leaf)}"
            )
            return leaf
        return jax.numpy.asarray(cand, dtype=leaf.dtype) if hasattr(leaf, "dtype") else cand

    updated = jax.tree_util.tree_map_with_path(merge, target)
    report["unexpected"] = [k for k in src if k not in used]
    if verbose:
        for kind in ("missing", "unexpected", "mismatched"):
            for k in report[kind]:
                print(f"copy_state_dict {kind}: {k}")
    return updated, report
