"""Pallas TPU kernel: fused spatial-attention GCN mixing (flash-style).

D3STN's ``SpatialAttentionGCN`` (reference ``example/D3STN/graphconv.py:57-125``
in DrownFish19/PaddleXDE) computes, per (batch, time) slice ``x_bt [N, D]``:

    s = x_bt x_bt^T / sqrt(D)            # data-dependent node affinity
    p = softmax_rows(s) * scale2         # scale2 = 1/sqrt(d_model) (is_scale)
    a = p (.) gate                       # gate = alpha*adj + beta*sc (static NxN)
    y = a @ x_bt                         # spatial mix

The XLA path materializes the ``[B, T, N, N]`` score tensor in HBM (44 MB per
instance at PEMS08 bs 32) and round-trips it through softmax / gate-multiply /
matmul — the single hottest buffer family in the train step's HLO (round-2
traffic attribution). This kernel keeps the whole N x N block resident in
VMEM per batch element: one HBM read of x, one write of y, nothing NxN ever
leaves the chip. The backward (``jax.custom_vjp``) recomputes s and p from x
(flash-attention-style) and accumulates the gate cotangent across the
sequential TPU grid.

A jnp reference path (bit-matching the model's einsum formulation) backs
non-TPU devices and the equality tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .spline_pallas import pallas_available

__all__ = ["gcn_spatial_mix", "pallas_available"]


def _dt(name: str):
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def _ref_impl(x, gate, scale2, dtype_name):
    """The model's exact einsum formulation (graphconv.py:107-125 semantics,
    native [B, N, T, D] layout)."""
    d = x.shape[-1]
    dt = _dt(dtype_name)
    score = jnp.einsum(
        "bntd,bmtd->btnm", x, x, preferred_element_type=jnp.float32
    ) / math.sqrt(d)
    score = jax.nn.softmax(score, axis=-1) * scale2
    adj = score.astype(dt) * gate.astype(dt)
    return jnp.einsum("btnm,bmtd->bntd", adj, x.astype(dt))


def _fwd_kernel(x_ref, gate_ref, out_ref, *, scale1, scale2, dtype_name):
    dt = _dt(dtype_name)
    t_len = x_ref.shape[2]
    gate = gate_ref[...].astype(dt)
    for t in range(t_len):  # static unroll: T = tgt_len (12)
        xb = x_ref[0, :, t, :]
        s = jax.lax.dot_general(
            xb, xb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale1
        p = jax.nn.softmax(s, axis=-1) * scale2
        a = p.astype(dt) * gate
        y = jnp.dot(a, xb.astype(dt), preferred_element_type=jnp.float32)
        out_ref[0, :, t, :] = y.astype(out_ref.dtype)


def _bwd_kernel(x_ref, gate_ref, g_ref, dx_ref, dgate_ref, *, scale1, scale2,
                dtype_name):
    from jax.experimental import pallas as pl

    t_len = x_ref.shape[2]
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dgate_ref[...] = jnp.zeros_like(dgate_ref)

    gate = gate_ref[...].astype(jnp.float32)
    dgate_acc = jnp.zeros(dgate_ref.shape, dgate_ref.dtype)
    for t in range(t_len):
        xb = x_ref[0, :, t, :].astype(jnp.float32)
        gb = g_ref[0, :, t, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            xb, xb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale1
        p0 = jax.nn.softmax(s, axis=-1)
        p = p0 * scale2
        # y = (p (.) gate) @ x   =>
        da = jax.lax.dot_general(  # dL/da = g x^T
            gb, xb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a = p * gate
        dx_v = jax.lax.dot_general(  # value path: a^T @ g
            a, gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dgate_acc = dgate_acc + (p * da).astype(dgate_ref.dtype)
        dp0 = gate * da * scale2
        ds = p0 * (dp0 - jnp.sum(dp0 * p0, axis=-1, keepdims=True))
        # s = x x^T * scale1  =>  dx += (ds + ds^T) @ x * scale1
        dx_qk = (
            jnp.dot(ds, xb, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                ds, xb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) * scale1
        dx_ref[0, :, t, :] = (dx_v + dx_qk).astype(dx_ref.dtype)
    dgate_ref[...] += dgate_acc


def _pallas_fwd(x, gate, scale1, scale2, dtype_name, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, t_len, d = x.shape
    dt = _dt(dtype_name)
    kern = functools.partial(
        _fwd_kernel, scale1=scale1, scale2=scale2, dtype_name=dtype_name
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, t_len, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, t_len, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, t_len, d), dt),
        interpret=interpret,
    )(x, gate)


def _pallas_bwd(x, gate, g, scale1, scale2, dtype_name, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, t_len, d = x.shape
    kern = functools.partial(
        _bwd_kernel, scale1=scale1, scale2=scale2, dtype_name=dtype_name
    )
    dx, dgate = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, t_len, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, t_len, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, t_len, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant index map: every grid step addresses the SAME block —
            # a sequential-grid reduction (init at i==0, accumulate after)
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
        ],
        interpret=interpret,
    )(x, gate, g)
    return dx, dgate


# SPMD partitioning: the kernel grid is embarrassingly parallel over batch —
# under a mesh the batch dim of x/g shards across devices and each shard runs
# the unmodified kernel; N stays replicated (the N x N score couples all
# nodes) and the dgate accumulator is psum'd. See ops/partition.py.


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(scale1, scale2, dtype_name, interpret):
    from .partition import shard_batched

    def impl(x, gate):
        return _pallas_fwd(x, gate, scale1, scale2, dtype_name, interpret)

    return shard_batched(
        impl,
        batched_args=(0,),
        batched_outs=(0,),
        n_outs=1,
        sharded_dims=1,
        rule="b n t d, n1 n2 -> b n t d",
        need_replication=("n", "t", "d", "n1", "n2"),
    )


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(scale1, scale2, dtype_name, interpret):
    from .partition import shard_batched

    def impl(x, gate, g):
        return _pallas_bwd(x, gate, g, scale1, scale2, dtype_name, interpret)

    return shard_batched(
        impl,
        batched_args=(0, 2),
        batched_outs=(0,),
        n_outs=2,
        sharded_dims=1,
        rule="b n t d, n1 n2, b n t d -> b n t d, n3 n4",
        need_replication=("n", "t", "d", "n1", "n2", "n3", "n4"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def gcn_spatial_mix(
    x,
    gate,
    scale2: float = 1.0,
    dtype_name: str = "float32",
    use_pallas: bool = False,
    interpret: bool = False,
    partitioned: bool = True,
):
    """Fused ``softmax(x x^T / sqrt(D)) * scale2 (.) gate @ x`` over the node
    axis of ``x [B, N, T, D]`` with ``gate [N, N]``.

    Numerically equivalent to the model's einsum chain (see ``_ref_impl``);
    gradients flow to ``x`` and ``gate`` (the gate cotangent carries alpha/
    beta gradients through the ``alpha*adj + beta*sc`` product outside).
    ``use_pallas=False`` runs the jnp reference (any backend).
    ``partitioned`` wraps the kernel in its SPMD rule (required under a
    multi-device mesh; skippable single-device — see ``config.spmd``).
    """
    if not use_pallas:
        return _ref_impl(x, gate, scale2, dtype_name)
    scale1 = 1.0 / math.sqrt(x.shape[-1])
    if not partitioned:
        return _pallas_fwd(x, gate, scale1, scale2, dtype_name, interpret)
    return _partitioned_fwd(scale1, scale2, dtype_name, interpret)(x, gate)


def _vjp_fwd(x, gate, scale2, dtype_name, use_pallas, interpret, partitioned):
    out = gcn_spatial_mix(
        x, gate, scale2, dtype_name, use_pallas, interpret, partitioned
    )
    return out, (x, gate)


def _vjp_bwd(scale2, dtype_name, use_pallas, interpret, partitioned, res, g):
    x, gate = res
    if not use_pallas:
        _, vjp = jax.vjp(
            lambda x_, gate_: _ref_impl(x_, gate_, scale2, dtype_name), x, gate
        )
        return vjp(g)
    scale1 = 1.0 / math.sqrt(x.shape[-1])
    if not partitioned:
        dx, dgate = _pallas_bwd(x, gate, g, scale1, scale2, dtype_name, interpret)
    else:
        dx, dgate = _partitioned_bwd(scale1, scale2, dtype_name, interpret)(x, gate, g)
    return dx, dgate.astype(gate.dtype)


gcn_spatial_mix.defvjp(_vjp_fwd, _vjp_bwd)
