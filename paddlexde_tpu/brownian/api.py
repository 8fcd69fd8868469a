"""Brownian-motion API: reference-shaped classes over the virtual tree.

Parity with ``paddlexde/utils/brownian/`` (DrownFish19/PaddleXDE):
``BaseBrownian`` / ``BrownianInterval`` / ``BrownianPath`` / ``BrownianTree`` /
``ReverseBrownian`` / ``brownian_interval_like`` with the reference call
convention ``bm(ta, tb, return_U=..., return_A=...)``
(``brownian_base.py:18-50``, ``derived.py``). The stateful knobs of the
reference (``pool_size``, ``cache_size``, ``halfway_tree``) are accepted and
ignored — the stateless tree has no pools or caches to tune.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .virtual_tree import brownian_pair, tol_to_depth

__all__ = [
    "BaseBrownian",
    "BrownianInterval",
    "BrownianPath",
    "BrownianTree",
    "ReverseBrownian",
    "AntitheticBrownian",
    "brownian_interval_like",
    "LEVY_AREA_APPROXIMATIONS",
]


class LEVY_AREA_APPROXIMATIONS:
    """Container parity with ``utils/sde_settings.py:4-10``; ``space_time_time``
    is an extension (round 3): the (W, U, V) triple descent for K-consuming
    high-order additive schemes (no reference counterpart)."""

    none = "none"
    space_time = "space-time"
    space_time_time = "space-time-time"
    davie = "davie"
    foster = "foster"
    # round-3 extension: bridge Fourier/KL expansion with exact-variance
    # Gaussian tail (Wiktorsson class) — exact total variance at every term
    # count, conditional law -> exact as levy_fourier_terms grows
    fourier = "fourier"


def _as_key(entropy_or_key):
    # ensure_compile_time_eval: jax.random.key(int) called under an ambient
    # jit trace would STAGE to a tracer, and a traced key closed into
    # sdeint_adjoint's custom_vjp backward crashes grad-of-jit ("No constant
    # handler for DynamicJaxprTracer"). The key is a compile-time constant by
    # construction, so evaluate it eagerly.
    if entropy_or_key is None:
        with jax.ensure_compile_time_eval():
            return jax.random.key(0)
    if isinstance(entropy_or_key, int):
        with jax.ensure_compile_time_eval():
            return jax.random.key(entropy_or_key)
    return entropy_or_key  # already a PRNG key


class BaseBrownian:
    def __call__(self, ta, tb=None, return_U=False, return_A=False):
        raise NotImplementedError

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self._dtype

    @property
    def levy_area_approximation(self):
        return self._levy


class BrownianInterval(BaseBrownian):
    """W over [t0, t1] with optional space-time/full Lévy areas.

    Signature parity with the reference ctor (``brownian_interval.py:361+``);
    ``entropy`` may also be a JAX PRNG key (``key=`` alias).

    .. warning:: the domain ``[t0, t1]`` must COVER every query: the tree
       CLIPS out-of-domain times to the boundary (raising is impossible
       under jit), so ``W`` freezes there while interval formulas keep
       using the unclipped ``tb − ta`` — the returned (W, U, K) triple
       turns mutually inconsistent and schemes integrate a bogus constant
       forcing (observed: a stiff solve's stationary m2 off by 100x from a
       bm built over a fifth of the span). ``sdeint``'s default bm derives
       its bounds from ``t_span``; only explicitly-constructed intervals
       can be mis-sized.

    .. note:: ``levy_area_approximation`` changes WHICH path the key
       generates, not just what is returned: the joint (W, U[, K]) descent
       consumes the node PRNG streams differently from the plain-W
       bisection, so two intervals sharing a key but differing in mode
       produce DIFFERENT (equal-in-law) paths. To couple schemes pathwise
       (convergence studies, scheme A-vs-B comparisons), share ONE bm
       object — or at least one mode — across all of them.
    """

    def __init__(
        self,
        t0: float,
        t1: float,
        size: Tuple[int, ...] = (),
        dtype=jnp.float32,
        entropy: Optional[Union[int, jax.Array]] = None,
        *,
        key=None,
        dt=None,
        tol: Optional[float] = None,
        pool_size: int = 8,
        cache_size: int = 45,
        halfway_tree: bool = False,
        levy_area_approximation: str = LEVY_AREA_APPROXIMATIONS.none,
        W=None,
        H=None,
        levy_fourier_terms: int = 8,
    ):
        del dt, pool_size, cache_size, halfway_tree, H  # stateless: no-ops
        # t0/t1 may be traced values (bm built inside jit): keep them as-is;
        # only the tol->depth conversion needs concrete floats, and it falls
        # back to the default depth for traced bounds.
        self._t0 = t0
        self._t1 = t1
        self._shape = tuple(size)
        self._dtype = dtype
        self._key = _as_key(key if key is not None else entropy)
        try:
            self._depth = tol_to_depth(float(t0), float(t1), tol)
        except TypeError:
            self._depth = tol_to_depth(0.0, 1.0, tol)
        self._levy = levy_area_approximation
        self._fourier_terms = int(levy_fourier_terms)
        self._w_total = None if W is None else jnp.asarray(W, dtype)

    @property
    def interval(self):
        return (self._t0, self._t1)

    def __call__(self, ta, tb=None, return_U=False, return_A=False,
                 return_K=False, return_J3=False):
        if tb is None:
            ta, tb = self._t0, ta  # reference: single arg means W(t0, ta)
        if return_J3:
            # joint (W, U, A, J3): the exact level-<=3 signature of the
            # truncated-KL bridge path (virtual_tree.fourier_triple). The A
            # returned here is the path's own — consistent with J3, slightly
            # under-dispersed vs the tail-corrected return_A area (O(1/n),
            # documented on fourier_path_coeffs) — so a scheme must take BOTH
            # from this query, never mix with a separate return_A call.
            if self._levy != LEVY_AREA_APPROXIMATIONS.fourier:
                raise ValueError(
                    "return_J3 (level-3 iterated integrals) requires "
                    "levy_area_approximation='fourier' (the truncated-KL "
                    f"path construction); got {self._levy!r}"
                )
            if not (return_U and return_A):
                raise ValueError(
                    "return_J3 is a joint query: pass return_U=True and "
                    "return_A=True (the scheme needs the consistent 4-tuple)"
                )
            return brownian_pair(
                self._key, self._t0, self._t1, ta, tb, self._shape,
                self._dtype, self._depth, self._w_total,
                levy="fourier", fourier_terms=self._fourier_terms,
                triple=True,
            )
        if self._levy == LEVY_AREA_APPROXIMATIONS.space_time_time:
            # K-configured interval: ALL queries route through the (W, U, V)
            # triple descent so W/U are identical across query modes
            if return_A:
                raise ValueError(
                    "full Lévy area is not available from the space-time-time "
                    "tree; construct with 'davie', 'foster' or 'fourier'."
                )
            from .virtual_tree import brownian_triple

            w, u, k = brownian_triple(
                self._key, self._t0, self._t1, ta, tb, self._shape,
                self._dtype, self._depth, self._w_total,
            )
            if return_K:
                return w, u, k
            if return_U:
                return w, u
            return w
        if return_K:
            raise ValueError(
                "return_K requires levy_area_approximation='space-time-time'"
            )
        if return_A and self._levy in ("none", "space-time"):
            raise ValueError(
                f"Lévy area requested but levy_area_approximation={self._levy!r}; "
                f"construct with 'davie', 'foster' or 'fourier'."
            )
        if return_U and self._levy == "none":
            raise ValueError(
                "space-time Lévy area requested but levy_area_approximation='none'"
            )
        # A Lévy-configured interval routes ALL queries (even plain-W ones)
        # through the joint (W, U) descent so W is identical across query
        # modes; the O(D^2) area matrix is only computed when requested (it is
        # sampled from an independent per-query key, so skipping it cannot
        # change W or U).
        levy_mode = self._levy if return_A else (
            "space-time" if self._levy != "none" else "none"
        )
        w, u, a = brownian_pair(
            self._key,
            self._t0,
            self._t1,
            ta,
            tb,
            self._shape,
            self._dtype,
            self._depth,
            self._w_total,
            levy=levy_mode,
            fourier_terms=self._fourier_terms,
        )
        if return_U and return_A:
            return w, u, a
        if return_U:
            return w, u
        if return_A:
            return w, a
        return w


class BrownianPath(BrownianInterval):
    """Reference ``derived.py:51-105``: an interval with unbounded cache —
    here identical to BrownianInterval (the stateless tree has no cache)."""

    def __init__(self, t0, w0=None, t1=None, size=None, **kwargs):
        if size is None and w0 is not None:
            size = jnp.asarray(w0).shape
        super().__init__(t0, t1 if t1 is not None else t0 + 1.0, size or (), **kwargs)
        self._w0 = None if w0 is None else jnp.asarray(w0)

    def __call__(self, ta, tb=None, return_U=False, return_A=False):
        out = super().__call__(ta, tb, return_U, return_A)
        if self._w0 is not None and tb is None and not (return_U or return_A):
            return out + self._w0
        return out


class BrownianTree(BrownianInterval):
    """Reference ``derived.py:108-197``: tol-controlled, query-order-
    independent sample paths — properties the stateless tree has natively."""

    def __init__(self, t0, w0=None, t1=None, entropy=None, tol=2**-12, **kwargs):
        size = kwargs.pop("size", None)
        if size is None and w0 is not None:
            size = jnp.asarray(w0).shape
        super().__init__(
            t0,
            t1 if t1 is not None else t0 + 1.0,
            size or (),
            entropy=entropy,
            tol=tol,
            **kwargs,
        )
        self._w0 = None if w0 is None else jnp.asarray(w0)


class AntitheticBrownian(BaseBrownian):
    """The pathwise-negated driving noise ``W̃ = −W`` for antithetic-variate
    Monte Carlo (no reference counterpart — its sdeint has no expectation
    tooling at all, ``paddlexde/functional/sdeint.py:9-37``).

    Negation preserves the Brownian law, so a solve driven by this wrapper is
    an equally valid sample whose functional is negatively correlated with
    the base path's — averaging the pair cancels the odd part of the
    functional exactly. Transformations are linearity in W per query:

        ΔW̃ = −ΔW       Ũ = −U       K̃ = −K       Ã = +A

    (the Lévy area is BILINEAR in the path, so the sign squares away:
    Ã_ij = ½∫(−W_i)d(−W_j) − ½∫(−W_j)d(−W_i) = A_ij). Exposes the base tree
    via ``base_brownian`` so schemes that derive auxiliary counters from the
    tree key (weak2's two-point V) keep working — V is independent of W and
    symmetric in law, so sharing it across the antithetic pair stays
    unbiased and tightens the coupling.
    """

    def __init__(self, base_brownian: BaseBrownian):
        if getattr(base_brownian, "_w0", None) is not None:
            raise ValueError(
                "AntitheticBrownian negates INCREMENTS; a w0-offset "
                "BrownianPath/BrownianTree's single-arg value queries would "
                "negate the offset too — wrap the zero-offset interval and "
                "add w0 yourself"
            )
        self.base_brownian = base_brownian
        self._shape = base_brownian.shape
        self._dtype = base_brownian.dtype
        self._levy = base_brownian.levy_area_approximation

    def __call__(self, ta, tb=None, return_U=False, return_A=False,
                 return_K=False, return_J3=False):
        # build kwargs conditionally: BrownianPath/Tree's __call__ has no
        # return_K parameter, so always forwarding it breaks every wrap
        kw = {}
        if return_U:
            kw["return_U"] = True
        if return_A:
            kw["return_A"] = True
        if return_K:
            kw["return_K"] = True
        if return_J3:
            kw["return_J3"] = True
        out = self.base_brownian(ta, tb, **kw)
        if not (return_U or return_A or return_K or return_J3):
            return jax.tree.map(jnp.negative, out)
        res = [jax.tree.map(jnp.negative, out[0])]  # −ΔW
        pos = 1
        if return_U or return_K:  # the tree returns U whenever K is asked
            res.append(jax.tree.map(jnp.negative, out[pos]))  # −U
            pos += 1
        if return_K:
            res.append(jax.tree.map(jnp.negative, out[pos]))  # −K
            pos += 1
        if return_A:
            res.append(out[pos])  # +A (bilinear)
            pos += 1
        if return_J3:
            # the negated path's level-3 signature: odd degree, so −J3
            res.append(jax.tree.map(jnp.negative, out[pos]))
            pos += 1
        return tuple(res)


class ReverseBrownian(BaseBrownian):
    """Negate query times for backward SDE solves (``derived.py:21-48``).

    The reversed path is ``W̃(s) = W(-s)`` — a Brownian motion in the
    substituted time ``s = -t``. Exact transformations per query over
    ``[sa, sb]`` (forward interval ``[ta, tb] = [-sb, -sa]``, ``h = sb-sa``):

        ΔW̃ = -ΔW
        Ĩ10 = ∫ (W̃(u) - W̃(sa)) du = U - h·ΔW      (substitute u = -r)

    so the space-time Lévy area is INVARIANT: H̃ = Ĩ10/h - ΔW̃/2
    = U/h - ΔW/2 = H. The reference returned U untransformed (it never wired
    ReverseBrownian in, SURVEY §2.11-10); the correction here is what makes
    reverse-time SRA1/SRIW1 possible. Full Lévy areas (``return_A``) flip
    sign under time reversal in the Davie construction (H̃ᵢW̃ⱼ - W̃ᵢH̃ⱼ =
    -(HᵢWⱼ - WᵢHⱼ)).
    """

    def __init__(self, base_brownian: BaseBrownian):
        self.base_brownian = base_brownian
        self._shape = base_brownian.shape
        self._dtype = base_brownian.dtype
        self._levy = base_brownian.levy_area_approximation

    def __call__(self, ta, tb=None, return_U=False, return_A=False,
                 return_K=False, return_J3=False):
        if tb is None:
            raise ValueError("ReverseBrownian requires both ta and tb")
        if return_J3:
            # the reversed path's signature is the GROUP INVERSE of the
            # forward one: exp(−ΔW − A − ℓ3) — virtual_tree.reverse_triple
            # carries the closed form (consistent with Ã = −A below)
            from .virtual_tree import reverse_triple

            w, u, a, j3 = self.base_brownian(
                -tb, -ta, return_U=True, return_A=True, return_J3=True
            )
            h = jnp.asarray(tb) - jnp.asarray(ta)
            u_r = jax.tree.map(
                lambda ul, wl: ul - jnp.asarray(h, wl.dtype) * wl, u, w
            )
            a_r, j3_r = reverse_triple(w, a, j3)
            return jax.tree.map(jnp.negative, w), u_r, a_r, j3_r
        if return_K:
            # K reversal algebra (substitute u = -r in the double integral):
            #   k̃ = h·u − k − (h²/2)·w
            # derived alongside Ĩ10 = u − h·w; both exact per query.
            w, u, k = self.base_brownian(-tb, -ta, return_U=True, return_K=True)
            h = jnp.asarray(tb) - jnp.asarray(ta)
            u_r = jax.tree.map(
                lambda ul, wl: ul - jnp.asarray(h, wl.dtype) * wl, u, w
            )
            k_r = jax.tree.map(
                lambda kl, ul, wl: (
                    jnp.asarray(h, wl.dtype) * ul - kl
                    - 0.5 * jnp.asarray(h, wl.dtype) ** 2 * wl
                ),
                k, u, w,
            )
            return jax.tree.map(jnp.negative, w), u_r, k_r
        out = self.base_brownian(-tb, -ta, return_U=return_U, return_A=return_A)
        if not (return_U or return_A):
            return -out
        h = jnp.asarray(tb) - jnp.asarray(ta)
        w = out[0]
        res = [-w]
        if return_U:
            u = out[1]
            res.append(jax.tree.map(
                lambda ul, wl: ul - jnp.asarray(h, wl.dtype) * wl, u, w
            ))
        if return_A:
            a = out[-1]
            res.append(jax.tree.map(jnp.negative, a))
        return tuple(res)


def brownian_interval_like(y, t0=0.0, t1=1.0, **kwargs):
    """A BrownianInterval matching ``y``'s shape/dtype (``derived.py:200-213``)."""
    y = jnp.asarray(y)
    kwargs.setdefault("size", y.shape)
    kwargs.setdefault("dtype", y.dtype)
    return BrownianInterval(t0, t1, **kwargs)
