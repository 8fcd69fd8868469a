"""Misc small utilities.

``flat_to_shape`` is API parity with the reference (``paddlexde/utils/
misc.py:1-13`` in DrownFish19/PaddleXDE). It exists there to emulate tuple
states over a flat trailing dim; in this framework pytree states make it
unnecessary internally — it is provided for users migrating code that used it.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["flat_to_shape"]


def flat_to_shape(tensor, length, shapes):
    """Slice a flat trailing dimension back into a tuple of shaped arrays.

    Args:
        tensor: array whose last axis concatenates the flattened members.
        length: leading shape (tuple) shared by all members, prepended to each
            member shape (the reference's ``length`` argument).
        shapes: sequence of member shapes.

    Returns:
        tuple of arrays, member ``i`` shaped ``(*tensor.shape[:-1], ...)``
        reshaped to ``length + shape``.
    """
    tensor = jnp.asarray(tensor)
    tensor_list = []
    total = 0
    for shape in shapes:
        next_total = total + int(np.prod(shape)) if len(shape) else total + 1
        tensor_list.append(
            tensor[..., total:next_total].reshape((*tuple(length), *tuple(shape)))
        )
        total = next_total
    return tuple(tensor_list)
