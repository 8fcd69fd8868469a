"""GSPMD/Shardy partitioning rules for the Pallas kernels.

``pallas_call`` lowers to a custom call the SPMD partitioner knows nothing
about: under a multi-device mesh it would replicate the operands (all-gather
the full batch to every chip) instead of sharding the embarrassingly parallel
batch grid. The reference's answer to multi-device training is wrapping the
whole model in ``DataParallel`` (``example/D3STN/train_dde.py:201-202`` in
DrownFish19/PaddleXDE) — its fast path never downgrades under DP, and ours
must not either.

:func:`shard_batched` gives a kernel the partitioning rule it lacks via
``jax.experimental.custom_partitioning``: the leading dims of the *batched*
operands/results keep whatever mesh sharding they arrive with (each shard
runs the unmodified kernel on its local block), every other dim/operand is
forced replicated, and outputs that are cross-batch reductions (weight/gate
gradients accumulated over the kernel's sequential grid) are ``psum``-ed over
the sharded axes inside the per-shard lowering. Works identically under the
Shardy partitioner (einsum-notation ``sharding_rule``) and legacy GSPMD
(``infer_sharding_from_operands``), and degrades to a plain call on a single
device / outside jit.
"""

from __future__ import annotations

import os
import re

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["shard_batched"]

# Escape hatch: PXT_NO_PARTITION=1 returns the kernels unwrapped (no SPMD
# rule — single-device only). For A/B-ing the wrapper's single-chip overhead
# and as a fallback if a jax upgrade breaks custom_partitioning.
_DISABLED = os.environ.get("PXT_NO_PARTITION", "0") == "1"


def _axes_of(entry):
    """Mesh axis names in one PartitionSpec entry (None | str | tuple)."""
    if entry is None:
        return ()
    return entry if isinstance(entry, tuple) else (entry,)


def shard_batched(
    impl,
    *,
    batched_args: tuple,
    batched_outs: tuple,
    n_outs: int,
    sharded_dims: int,
    rule: str,
    need_replication: tuple,
):
    """Wrap ``impl(*arrays)`` with a batch-parallel SPMD partitioning rule.

    ``impl`` takes flat positional array arguments and returns one array
    (``n_outs == 1``) or a tuple. The leading ``sharded_dims`` dims of every
    argument listed in ``batched_args`` — and of every output listed in
    ``batched_outs`` — may be mesh-sharded and must agree (the sharding of
    ``batched_args[0]`` wins; the partitioner reshards the rest to match).
    All other dims and arguments are forced replicated. Outputs *not* in
    ``batched_outs`` are treated as per-shard partial sums over the sharded
    leading axes and all-reduced in the per-shard lowering.

    ``rule``/``need_replication`` express the same contract for the Shardy
    partitioner in einsum notation (factors for shardable dims shared between
    operands and results; every other factor marked need-replication).
    """
    if _DISABLED:
        return impl
    wrapped = custom_partitioning(impl)
    single_out = n_outs == 1

    # Shardy assigns factor indices by first appearance in the rule and
    # requires the special-factor (need-replication) set sorted by that index
    order = {}
    for tok in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", rule):
        order.setdefault(tok, len(order))
    need_replication = tuple(sorted(need_replication, key=order.__getitem__))

    def _shardings(mesh, arg_shapes):
        spec = arg_shapes[batched_args[0]].sharding.spec
        lead = tuple(spec[i] if i < len(spec) else None for i in range(sharded_dims))

        def b_sh(rank):
            return NamedSharding(mesh, P(*lead, *([None] * (rank - sharded_dims))))

        def r_sh(rank):
            return NamedSharding(mesh, P(*([None] * rank)))

        return lead, b_sh, r_sh

    def _out_shardings(mesh, arg_shapes, result_shape):
        lead, b_sh, r_sh = _shardings(mesh, arg_shapes)
        res = result_shape if isinstance(result_shape, (list, tuple)) else (result_shape,)
        out_sh = tuple(
            b_sh(len(s.shape)) if i in batched_outs else r_sh(len(s.shape))
            for i, s in enumerate(res)
        )
        return lead, b_sh, r_sh, (out_sh[0] if single_out else out_sh)

    def partition(mesh, arg_shapes, result_shape):
        lead, b_sh, r_sh, out_sh = _out_shardings(mesh, arg_shapes, result_shape)
        in_sh = tuple(
            b_sh(len(s.shape)) if i in batched_args else r_sh(len(s.shape))
            for i, s in enumerate(arg_shapes)
        )
        reduce_axes = tuple(a for entry in lead for a in _axes_of(entry))

        def lower_fn(*args):
            outs = impl(*args)
            if single_out or not reduce_axes:
                return outs
            return tuple(
                o if i in batched_outs else jax.lax.psum(o, reduce_axes)
                for i, o in enumerate(outs)
            )

        return mesh, lower_fn, out_sh, in_sh

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _out_shardings(mesh, arg_shapes, result_shape)[3]

    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=need_replication,
    )
    return wrapped
