"""Numerical sanity checks (inf/nan detection).

Equivalent of the reference's register_inf_check_hooks
(ref zipvoice/utils/hooks.py:26-96): instead of module hooks, pytrees
(params / grads / activations) are scanned after the fact, and the trainers'
--inf-check mode calls these between steps.  For in-graph checking there is
``checkify_finite`` built on jax.debug.
"""

from __future__ import annotations

import logging
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def find_nonfinite(tree, prefix: str = "") -> List[str]:
    """Names of leaves containing non-finite values (host-side)."""
    bad = []

    def walk(node, name):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{name}.{k}" if name else k)
            return
        arr = np.asarray(node)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(name)

    walk(tree, prefix)
    return bad


def warn_nonfinite(tree, what: str = "tree") -> bool:
    bad = find_nonfinite(tree)
    for name in bad:
        logging.warning("%s: non-finite values in %s", what, name)
    return not bad


def assert_all_finite(tree, what: str = "tree"):
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {what}: {bad[:10]}")


def checkify_finite(x: jax.Array, name: str) -> jax.Array:
    """In-graph non-finite detector: prints a warning from inside jit when x
    has inf/nan (ref hooks warn on module outputs)."""
    ok = jnp.isfinite(x.astype(jnp.float32)).all()
    jax.debug.callback(
        lambda ok_, name_=name: None
        if bool(ok_)
        else logging.warning("inf-check: non-finite output in %s", name_),
        ok,
    )
    return x
