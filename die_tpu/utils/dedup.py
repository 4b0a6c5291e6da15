"""Index/dedup helpers — twins of core/data_utilities.py:11-38.

The engine's scatter semantics make these unnecessary internally (duplicates
are resolved deterministically by the winner-take-last sort), but they are
part of the reference's public utility surface.
"""
from __future__ import annotations

import numpy as np

from die_tpu.core.mathx import xp_of


def index_select(array, index, axis: int = 0):
    """Select rows by integer index along an axis (np or jnp)."""
    xp = xp_of(array)
    return xp.take(array, index, axis=axis)


def mask_duplicates(a, keep: str = "first"):
    """Boolean mask of duplicate occurrences in a 1-D array.

    ``keep='first'`` marks every occurrence after the first as a duplicate
    (the reference's ``np_mask_duplicates`` semantics); ``keep='none'`` marks
    every member of any duplicated group.
    """
    a = np.asarray(a)
    order = np.argsort(a, kind="stable")
    sa = a[order]
    same_prev = np.concatenate([[False], sa[1:] == sa[:-1]])
    if keep == "first":
        dup_sorted = same_prev
    elif keep == "none":
        same_next = np.concatenate([sa[:-1] == sa[1:], [False]])
        dup_sorted = same_prev | same_next
    else:
        raise ValueError(keep)
    out = np.zeros_like(dup_sorted)
    out[order] = dup_sorted
    return out
