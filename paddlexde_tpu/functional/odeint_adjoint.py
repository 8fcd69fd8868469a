"""O(1)-memory adjoint gradients for odeint via ``jax.custom_vjp``.

TPU-native rebuild of the reference's ``OdeintAdjointMethod`` PyLayer
(``paddlexde/functional/odeint_adjoint.py:11-167`` in DrownFish19/PaddleXDE),
which re-integrates the augmented ODE backward per saved output interval. The
JAX formulation is structurally simpler and strictly more capable:

- parameters are discovered by ``jax.closure_convert`` — whatever arrays the
  user's ``func`` closes over become explicit differentiable residuals, which
  subsumes the reference's ``find_parameters`` + DataParallel special-casing
  (``odeint_adjoint.py:260-277``) and its manual ``adjoint_params`` plumbing;
- the augmented state ``(adj_t, y, adj_y, adj_params)`` is a pytree carry — no
  flatten/unflatten (``flat_to_shape``) layer;
- each backward interval re-enters the SAME scan/while solver engines, and the
  per-interval re-injection of forward states + incoming cotangents
  (``odeint_adjoint.py:134-159``) is one ``lax.scan`` over reversed intervals;
- the cotangent of ``t_span`` is produced exactly as the reference's
  ``t_requires_grad`` path (``:130-141``): ``dL/dt_i = <grad_y_i, f(t_i, y_i)>``
  per output, with the integrated ``adj_t`` landing on ``t_0``.

Adjoint norm options mirror ``handle_adjoint_norm_`` (``:280-327``): the default
norm on the augmented state is the mixed (max-of-member-RMS) norm; pass
``adjoint_options={"norm": "seminorm"}`` to exclude parameter cotangents from
step-size control, or a callable for a custom norm.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.norms import rms_norm, zero_norm
from ..xde.term import XDETerm, ode_term
from .solve import _is_decreasing, format_solution, integrate_term

__all__ = ["odeint_adjoint"]


def _tree_dot(a, b):
    """<a, b> summed over all leaves."""
    leaves = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.sum(x * y), a, b))
    return sum(leaves) if leaves else jnp.zeros(())


def _make_adjoint_norm(adjoint_norm_opt, y_def, params_def):
    """Build the norm over the (adj_t, y, adj_y, adj_params) augmented pytree."""
    if callable(adjoint_norm_opt):
        return adjoint_norm_opt

    include_params = adjoint_norm_opt != "seminorm"

    def norm(aug):
        adj_t, y, adj_y, adj_p = aug
        members = [jnp.abs(adj_t), rms_norm(y), rms_norm(adj_y)]
        if include_params:
            members.extend(rms_norm(leaf) for leaf in jax.tree.leaves(adj_p))
        else:
            zero_norm(adj_p)
        return jnp.max(jnp.stack([jnp.asarray(m) for m in members]))

    del y_def, params_def
    return norm


def _single_pass_backward(
    bwd_term, f_eval, sol, ts_, grad_y_all, consts_, zeros_p, span_sign,
    adj_spec, adjoint_rtol, adjoint_atol, adjoint_norm, adj_opts, take,
):
    """One adaptive solve for the whole augmented backward pass.

    The reference (and our fallback) re-enters the solver once per saved output
    interval (``odeint_adjoint.py:134-159`` upstream), paying per-interval
    setup (initial f eval, dt re-guess, dense-output plumbing) T-1 times. Here
    the augmented system integrates over the full reversed span in a single
    ``lax.while_loop``: ``step_t`` pins steps to land exactly on every output
    boundary, and at each landing the incoming cotangent is injected, the
    saved forward state re-injected (drift control, exactly as the reference's
    per-interval re-injection), and f refreshed. dt carries across boundaries.
    """
    from ..solver.adaptive import TABLEAUS, RKState, make_adaptive_step
    from ..utils.ode_utils import select_initial_step

    n_out = ts_.shape[0]
    time_dtype = ts_.dtype
    tableau = TABLEAUS[adj_spec.name]

    # s-coordinates: strictly increasing traversal of the reversed span
    s_grid = (span_sign * ts_)[::-1]
    s_end = s_grid[-1]
    sol_rev = jax.tree.map(lambda a: a[::-1], sol)
    grad_rev = jax.tree.map(lambda a: a[::-1], grad_y_all)

    # dL/dt_i = <grad_i, f(t_i, y_i)> for every output, one batched eval
    f_all = jax.vmap(lambda t, y: f_eval(t, y, consts_))(ts_, sol)
    dLd_ts = sum(
        jnp.sum(
            (g * f).reshape(n_out, -1), axis=1
        )
        for g, f in zip(jax.tree.leaves(grad_y_all), jax.tree.leaves(f_all))
    )

    dLd_rev = dLd_ts[::-1]  # index j corresponds to original i = n_out-1-j

    aug0 = (
        (-dLd_rev[0]).astype(time_dtype),
        take(sol_rev, 0),
        take(grad_rev, 0),
        zeros_p,
    )
    s0 = s_grid[0]
    f0 = bwd_term.move(s0, jnp.zeros((), time_dtype), aug0)
    first_step = adj_opts.get("first_step")
    if first_step is None:
        dt0 = select_initial_step(
            bwd_term.move, s0, aug0, tableau.order - 1, adjoint_rtol,
            adjoint_atol, norm=adjoint_norm, f0=f0,
        )
    else:
        dt0 = jnp.asarray(first_step, time_dtype)

    step = make_adaptive_step(
        bwd_term, tableau, adjoint_rtol, adjoint_atol, adjoint_norm,
        jnp.asarray(adj_opts.get("safety", 0.9), time_dtype),
        jnp.asarray(adj_opts.get("ifactor", 10.0), time_dtype),
        jnp.asarray(adj_opts.get("dfactor", 0.2), time_dtype),
        jnp.asarray(adj_opts.get("min_step", 0.0), time_dtype),
        jnp.asarray(adj_opts.get("max_step", float("inf")), time_dtype),
        s_grid[1:],  # step_t: land exactly on every output boundary
        None,
        time_dtype,
    )

    zero_coeff = [aug0] + [jax.tree.map(jnp.zeros_like, aug0)] * 4
    state0 = RKState(
        y1=aug0, f1=f0, t0=s0, t1=s0, dt=dt0.astype(time_dtype),
        interp_coeff=zero_coeff,
        next_step_index=jnp.zeros((), jnp.int32),
        next_jump_index=jnp.zeros((), jnp.int32),
        nfe=jnp.ones((), jnp.int32),
        n_accept=jnp.zeros((), jnp.int32),
        n_reject=jnp.zeros((), jnp.int32),
        status=jnp.zeros((), jnp.int32),
    )

    max_iters = int(adj_opts.get("max_num_steps", 2**31 - 1))
    max_iters_arr = jnp.asarray(min(max_iters, 2**31 - 1), jnp.int32)

    def cond(carry):
        s, ptr, n_it = carry
        return (s.t1 < s_end) & (n_it < max_iters_arr) & (s.status == 0)

    def body(carry):
        s, ptr, n_it = carry
        s2 = step(s)
        # landed exactly on the next output boundary? (step_t clipping makes
        # the landing bitwise-exact; interior boundaries only — the final one
        # terminates the loop)
        boundary = s_grid[jnp.minimum(ptr, n_out - 1)]
        landed = (s2.t1 >= boundary) & (ptr < n_out - 1)

        j = jnp.minimum(ptr, n_out - 1)  # reversed index of this boundary
        adj_t, y, adj_y, adj_p = s2.y1
        adj_t_new = adj_t - dLd_rev[j].astype(adj_t.dtype)
        y_new = take(sol_rev, j)
        adj_y_new = jax.tree.map(jnp.add, adj_y, take(grad_rev, j))
        sel = lambda a, b: jax.tree.map(
            lambda x, z: jnp.where(landed, x, z), a, b
        )
        aug_new = (
            jnp.where(landed, adj_t_new, adj_t),
            sel(y_new, y),
            sel(adj_y_new, adj_y),
            adj_p,
        )
        f_new = jax.lax.cond(
            landed,
            lambda: bwd_term.move(s2.t1, jnp.zeros((), time_dtype), aug_new),
            lambda: s2.f1,
        )
        s2 = s2._replace(
            y1=aug_new,
            f1=f_new,
            nfe=s2.nfe + landed.astype(jnp.int32),
        )
        return (s2, ptr + landed.astype(jnp.int32), n_it + 1)

    final, _, _ = jax.lax.while_loop(cond, body, (state0, jnp.ones((), jnp.int32), jnp.zeros((), jnp.int32)))

    adj_t, _, adj_y, adj_p = final.y1
    # final incoming cotangent at the last boundary (original t_0)
    adj_y = jax.tree.map(jnp.add, adj_y, take(grad_rev, n_out - 1))

    grad_ts = dLd_ts.astype(ts_.dtype).at[0].set(adj_t.astype(ts_.dtype))
    # A failed backward (DT_UNDERFLOW / NON_FINITE / step budget) must be
    # LOUD: a partially integrated adjoint is a silently wrong gradient
    # (observed on-chip: a dt-underflowing f32 backward returned 0.92 where
    # 2.48 was exact, training on garbage). Poison with NaN instead.
    bad = (final.status != 0) | (final.t1 < s_end)
    poison = lambda tree: jax.tree.map(
        lambda a: jnp.where(bad, jnp.full_like(a, jnp.nan), a), tree
    )
    return (poison(adj_y), poison(grad_ts), poison(adj_p))


def odeint_adjoint(
    func,
    y0,
    t_span,
    solver="dopri5",
    *,
    rtol=1e-7,
    atol=1e-9,
    options: Optional[dict] = None,
    adjoint_solver=None,
    adjoint_rtol=None,
    adjoint_atol=None,
    adjoint_options: Optional[dict] = None,
    adjoint_params=None,
    time_axis: int = -2,
):
    """Like :func:`odeint`, but gradients flow through the augmented backward
    ODE in O(1) memory instead of through the forward scan.

    ``adjoint_params`` is accepted for reference-signature parity
    (``odeint_adjoint.py:170-257``) but unnecessary: closure-converted arrays
    are differentiated automatically.

    Forward-value parity: the primal output is numerically identical to
    ``odeint`` with the same solver/options.
    """
    del adjoint_params  # JAX discovers parameters via closure_convert
    _sympl = ("leapfrog", "velocity_verlet", "yoshida4")
    if (isinstance(solver, str) and solver.lower() in _sympl) or (
        isinstance(adjoint_solver, str) and adjoint_solver.lower() in _sympl
    ):
        raise ValueError(
            "symplectic solvers take a (q, p) PAIR state with a separable "
            "vector field; the adjoint's augmented backward system is "
            "neither — differentiate odeint directly (the scan backprop is "
            "exact), or pass adjoint_solver='rk4' explicitly with a "
            "non-symplectic forward"
        )
    adjoint_solver = adjoint_solver if adjoint_solver is not None else solver
    adjoint_rtol = rtol if adjoint_rtol is None else adjoint_rtol
    adjoint_atol = atol if adjoint_atol is None else adjoint_atol
    adjoint_options = dict(adjoint_options or {})
    adjoint_norm_opt = adjoint_options.pop("norm", "mixed")

    # keep the RAW input around for static introspection: jnp.asarray STAGES
    # even concrete numpy constants to tracers under an ambient jit trace, so
    # anything np.asarray-ing the converted t_span silently fails there
    # (found by review: the k_sub backward-grid refinement disabled under
    # jit, leaving jit(grad(f)) with the coarse one-step-per-interval
    # adjoint while eager grad(f) got the refined one)
    t_span_static = t_span
    t_span = jnp.asarray(t_span)
    y0 = jax.tree.map(jnp.asarray, y0)
    reverse_span = _is_decreasing(t_span_static)

    converted, consts = jax.closure_convert(
        lambda t, y: func(t, y), t_span[0], y0
    )
    consts = tuple(consts)

    @jax.custom_vjp
    def _solve(y0_, ts_, consts_):
        term = ode_term(lambda t, y: converted(t, y, *consts_))
        return integrate_term(
            term, y0_, ts_, solver, rtol=rtol, atol=atol, options=options, time_axis=0
        )

    def _fwd(y0_, ts_, consts_):
        sol = _solve(y0_, ts_, consts_)
        return sol, (sol, ts_, consts_)

    def _bwd(res, grad_sol):
        sol, ts_, consts_ = res
        n_out = ts_.shape[0]

        def f_eval(t, y, consts__):
            return converted(t, y, *consts__)

        adjoint_norm = _make_adjoint_norm(adjoint_norm_opt, y0, consts_)

        def aug_dynamics(t, aug):
            """(adj_t', y', adj_y', adj_p') — reference ``augmented_dynamics``
            (``odeint_adjoint.py:89-124``), via one jax.vjp."""
            _, y, adj_y, _ = aug
            fval, vjp_fn = jax.vjp(f_eval, t, y, consts_)
            neg_adj = jax.tree.map(jnp.negative, adj_y)
            vjp_t, vjp_y, vjp_p = vjp_fn(neg_adj)
            return (vjp_t, fval, vjp_y, vjp_p)

        aug_term = ode_term(aug_dynamics)
        # integrate each [t_i -> t_{i-1}] interval; for an increasing user span
        # that is backward in time, realized as forward integration of the
        # negated field over s = -t (exact for additive terms).
        if not reverse_span:
            def interval_term():
                def move(s, ds, aug):
                    return jax.tree.map(
                        jnp.negative, aug_term.move(-s, -ds, aug)
                    )
                return XDETerm(move=move, fuse=aug_term.fuse, additive=True, kind="ode")
            span_sign = -1.0
        else:
            def interval_term():
                return aug_term
            span_sign = 1.0
        bwd_term = interval_term()

        adj_opts = dict(adjoint_options)
        adj_opts["norm"] = adjoint_norm
        from ..solver.registry import resolve_solver as _rs

        adj_spec = _rs(adjoint_solver)
        resolve_adaptive = adj_spec.kind == "adaptive"

        zeros_p = jax.tree.map(jnp.zeros_like, consts_)
        grad_y_all = grad_sol  # time-first [T, ...]

        def take(tree, i):
            return jax.tree.map(lambda a: a[i], tree)

        # Single-pass backward (beats the reference's per-interval structure):
        # ONE adaptive solve over the whole reversed span with steps clipped to
        # land exactly on output boundaries (step_t), injecting the incoming
        # cotangents + saved forward states at each landing. Requires strictly
        # monotone concrete t_span; otherwise falls back to per-interval.
        strictly_monotone = False
        try:
            ct = np.asarray(ts_)
            diffs = np.diff(ct)
            strictly_monotone = bool(np.all(diffs > 0) or np.all(diffs < 0))
        except Exception:
            pass

        if resolve_adaptive and strictly_monotone and n_out > 2:
            return _single_pass_backward(
                bwd_term, f_eval, sol, ts_, grad_y_all, consts_, zeros_p,
                span_sign, adj_spec, adjoint_rtol, adjoint_atol, adjoint_norm,
                adj_opts, take,
            )

        # Fixed-solver backward discretization (round 3): the per-interval
        # fallback used to solve each [t_i, t_{i-1}] with the DEFAULT grid —
        # one step per output interval — so a forward on a fine explicit
        # grid/step_size got an adjoint gradient orders coarser than its
        # value (measured 0.8% on a 33-node rk4 grid). Derive a static
        # sub-step count from the forward discretization and hand each
        # interval a matching (traced-endpoint) linspace grid.
        k_sub = None
        if adj_spec.kind == "fixed" and not (
            {"step_size", "grid", "grid_constructor"} & set(adj_opts)
        ):
            fwd_opts = dict(options or {})
            # separate guards: the forward grid is usually a concrete numpy
            # array even when the span is traced — one broad try would let a
            # traced span discard an already-recovered h_fwd (review find)
            h_fwd, width_max = fwd_opts.get("step_size"), None
            try:
                if h_fwd is None and fwd_opts.get("grid") is not None:
                    g = np.asarray(fwd_opts["grid"])
                    h_fwd = np.min(np.abs(np.diff(g)))
                    width_max = np.abs(g[-1] - g[0])  # bound if span is traced
            except Exception:
                h_fwd = None
            try:
                ct = np.asarray(t_span_static)
                widths = np.abs(np.diff(ct))
                if widths.size:
                    width_max = widths.max()
                if h_fwd is None and fwd_opts.get("grid_constructor") is not None:
                    g = np.asarray(fwd_opts["grid_constructor"](ct))
                    h_fwd = np.min(np.abs(np.diff(g)))
            except Exception:
                pass  # traced span: width_max may still come from the grid
            if h_fwd is not None and width_max is not None and float(h_fwd) > 0:
                k_sub = int(min(
                    65536, max(1, np.ceil(float(width_max) / float(h_fwd)))
                ))

        # carry: (adj_t, adj_y, adj_p, bad); per-step inputs: i = T-1 .. 1
        def scan_body(carry, i):
            adj_t, adj_y, adj_p, bad = carry
            t_i = ts_[i]
            t_im1 = ts_[i - 1]
            y_i = take(sol, i)
            g_i = take(grad_y_all, i)

            adj_y = jax.tree.map(jnp.add, adj_y, g_i)
            f_i = f_eval(t_i, y_i, consts_)
            dLd_t_i = _tree_dot(g_i, f_i)
            adj_t = adj_t - dLd_t_i

            aug0 = (adj_t, y_i, adj_y, adj_p)
            s_span = span_sign * jnp.stack([t_i, t_im1])
            opts_i = dict(adj_opts)
            if k_sub is not None:
                opts_i["grid"] = jnp.linspace(s_span[0], s_span[1], k_sub + 1)
            if resolve_adaptive and "first_step" not in opts_i:
                # warm-start each backward interval at half its width instead
                # of re-running the Hairer heuristic (2 NFE + a conservative
                # tiny dt) 1x per saved output — big win on dense output grids
                opts_i["first_step"] = 0.5 * jnp.abs(t_i - t_im1)
            if resolve_adaptive:
                opts_i["return_stats"] = True
            out = integrate_term(
                bwd_term,
                aug0,
                s_span,
                adjoint_solver,
                rtol=adjoint_rtol,
                atol=adjoint_atol,
                options=opts_i,
                time_axis=0,
            )
            if resolve_adaptive:
                aug_sol, st = out
                bad = bad | (st.status != 0)
            else:
                aug_sol = out
            adj_t, _, adj_y, adj_p = take(aug_sol, 1)
            return (adj_t, adj_y, adj_p, bad), dLd_t_i

        # adj_y starts at zero; the first scan step adds grad_y[T-1].
        init = (jnp.zeros((), ts_.dtype), jax.tree.map(jnp.zeros_like, y0),
                zeros_p, jnp.zeros((), bool))
        idxs = jnp.arange(n_out - 1, 0, -1)
        (adj_t, adj_y, adj_p, bad), dLd_ts = jax.lax.scan(scan_body, init, idxs)

        # final incoming cotangent at t_0
        adj_y = jax.tree.map(jnp.add, adj_y, take(grad_y_all, 0))

        # t_span cotangent: dLd_ts holds dL/dt_i for i = T-1..1; t_0 gets adj_t
        grad_ts = jnp.zeros_like(ts_)
        grad_ts = grad_ts.at[jnp.arange(n_out - 1, 0, -1)].set(
            dLd_ts.astype(ts_.dtype)
        )
        grad_ts = grad_ts.at[0].set(adj_t.astype(ts_.dtype))

        # failed backward solves must be LOUD (see _single_pass_backward):
        # NaN gradients instead of a silently truncated adjoint
        poison = lambda tree: jax.tree.map(
            lambda a: jnp.where(bad, jnp.full_like(a, jnp.nan), a), tree
        )
        return (poison(adj_y), poison(grad_ts), poison(adj_p))

    _solve.defvjp(_fwd, _bwd)

    solution = _solve(y0, t_span, consts)
    return format_solution(solution, time_axis)
