"""Small shared utilities (reference open_clip/utils.py equivalents)."""

from __future__ import annotations

from itertools import repeat
from typing import Any, Iterable


def _ntuple(n):
    def parse(x):
        if isinstance(x, Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(repeat(x, n))

    return parse


to_1tuple = _ntuple(1)
to_2tuple = _ntuple(2)
to_3tuple = _ntuple(3)
to_4tuple = _ntuple(4)


def freeze_batch_stats(variables: dict) -> dict:
    """Equivalent of freeze_batch_norm_2d (utils.py:9): in flax, frozen BN
    means applying with use_running_average=True and never passing
    batch_stats as mutable — this helper just drops any batch_stats
    collection so apply() can't update it."""
    return {k: v for k, v in variables.items() if k != "batch_stats"}


def count_params(tree: Any) -> int:
    import jax

    return sum(x.size for x in jax.tree.leaves(tree))
