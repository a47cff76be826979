"""Broadcast-multiply-sum einsum for tiny (well-sized) operands.

XLA's TPU backend lowers small or oddly-shaped ``dot_general`` ops to
SERIAL while loops (one dynamic-update-slice step per contracted
element): a traced norne-class Newton iteration carried 36 such while
ops, every one a well-system contraction over W<=4 wells. The same
contractions expressed as broadcast-multiply + ``sum`` lower to plain
vector ops. Only use for operands where the broadcast product is tiny
(wells: [W,P,4,3]-class shapes); large contractions belong on the MXU
via jnp.einsum.
"""

from __future__ import annotations

import jax.numpy as jnp


def esum(spec: str, a, b):
    """``jnp.einsum(spec, a, b)`` as broadcast-multiply + sum.

    Supports two-operand specs with single-letter labels and no
    repeated labels within one operand (all the well-system cases).
    """
    ins, out = spec.split("->")
    la, lb = ins.split(",")
    labels = []
    for c in la + lb:
        if c not in labels:
            labels.append(c)

    def expand(x, lx):
        # transpose x's axes into the order its labels appear in
        # `labels`, then insert None for absent labels
        order = sorted(range(len(lx)), key=lambda i: labels.index(lx[i]))
        x = jnp.transpose(x, order)
        idx = tuple(slice(None) if c in lx else None for c in labels)
        return x[idx]

    prod = expand(a, la) * expand(b, lb)
    red = tuple(i for i, c in enumerate(labels) if c not in out)
    res = prod.sum(axis=red) if red else prod
    kept = [c for c in labels if c in out]
    if kept != list(out):
        res = jnp.transpose(res, [kept.index(c) for c in out])
    return res
