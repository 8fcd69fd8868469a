"""Preconditioners for the matrix-free Newton--Krylov implicit solvers.

The Krylov steppers (``implicit_euler_krylov``, ``sdirk2_krylov``) accept a
``preconditioner`` callable ``v -> M^-1 v`` approximating ``(I - c*dt*J)^-1``.
Unpreconditioned GMRES resolves ``dt*||J||`` only up to ~1e5 (f32) / ~1e6
(f64) within its default matvec budget; a good M removes that ceiling.

This module ships the workhorse for semi-discretized diffusion problems: the
EXACT spectral inverse of ``I - nu*dt*Laplacian`` under Dirichlet boundaries,
applied in O(D log D) with two FFT-based sine transforms. For
reaction-diffusion systems, preconditioning by the diffusion part alone is
the classic choice — GMRES then only has to resolve the (mild) reaction
Jacobian. (No analogue in the reference: its only stiff path was host-side
scipy, SURVEY §2.3.)
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = [
    "dst1",
    "dirichlet_heat_preconditioner",
    "periodic_heat_preconditioner",
    "neumann_heat_preconditioner",
    "jacobi_preconditioner",
]


def dst1(v):
    """Un-normalized type-I discrete sine transform of the LAST axis via the
    FFT of the odd extension: returns ``2 * sum_j v_j sin(pi j k / (D+1))``.
    Self-inverse up to the factor ``2 (D+1)``: ``dst1(dst1(v)) == 2(D+1) v``.
    """
    d = v.shape[-1]
    zeros = jnp.zeros(v.shape[:-1] + (1,), v.dtype)
    ext = jnp.concatenate([zeros, v, zeros, -v[..., ::-1]], axis=-1)
    return (-jnp.fft.fft(ext, axis=-1).imag[..., 1 : d + 1]).astype(v.dtype)


def dirichlet_heat_preconditioner(n, dx, dt, nu=1.0, dtype=jnp.float32):
    """Exact inverse of ``I - nu*dt*Laplacian`` (2nd-order stencil, Dirichlet).

    The Dirichlet Laplacian's eigenvectors are the DST-I modes with
    eigenvalues ``-mu_k = -(2 - 2 cos(pi k dx))/dx^2``, so the operator is
    diagonal in sine space: transform, divide by ``1 + nu*dt*mu_k``, transform
    back. Use as ``make_implicit_euler_krylov_step(preconditioner=M)`` /
    ``make_sdirk2_step(krylov=True, preconditioner=M)`` — note the SDIRK stage
    operator is ``I - gamma*dt*J``, so pass ``dt_eff = gamma*dt`` there.

    Measured (1-D heat, D~8k, f32, dt*||J|| ~ 2.7e6): unpreconditioned
    GMRES diverges (endpoint error ~55); with this M the Krylov solve is
    accurate to f32 roundoff (~1e-5).

    GRID SIZE RULE: pick ``n = 2**k - 1`` interior points so the sine
    transform's FFT length ``2(n+1)`` is a power of two. TPU FFT falls off a
    cliff on large prime factors — measured 47 ms (n=8191, length 16384) vs
    16.8 s (n=8192, length 16386 = 2*3*2731) for the same 5-step solve.
    """
    k = np.arange(1, n + 1)
    mu = (2.0 - 2.0 * np.cos(np.pi * k * dx)) / dx**2
    denom = jnp.asarray(1.0 + nu * float(dt) * mu, dtype)
    scale = 1.0 / (2.0 * (n + 1))

    def apply(v):
        return dst1(dst1(v) / denom.astype(v.dtype)) * jnp.asarray(scale, v.dtype)

    return apply


def periodic_heat_preconditioner(n, dx, dt, nu=1.0, dtype=jnp.float32):
    """Exact inverse of ``I - nu*dt*Laplacian`` with PERIODIC boundaries.

    The periodic second-difference operator is diagonalized by the DFT with
    eigenvalues ``-mu_k = -(2 - 2 cos(2 pi k / n))/dx^2``; one rfft/irfft pair
    applies the inverse in O(n log n). Same usage and grid-size rule as
    :func:`dirichlet_heat_preconditioner` (here ``n`` itself should be a
    power of two).
    """
    k = np.arange(n // 2 + 1)
    mu = (2.0 - 2.0 * np.cos(2.0 * np.pi * k / n)) / dx**2
    denom = jnp.asarray(1.0 + nu * float(dt) * mu)

    def apply(v):
        return jnp.fft.irfft(jnp.fft.rfft(v, axis=-1) / denom, n=n, axis=-1).astype(
            v.dtype
        )

    return apply


def neumann_heat_preconditioner(n, dx, dt, nu=1.0, dtype=jnp.float32):
    """Exact inverse of ``I - nu*dt*Laplacian`` with NEUMANN (reflecting)
    boundaries — the ghost-point stencil ``u[-1] = u[0], u[n] = u[n-1]``.

    Diagonalized by the type-II DCT (eigenvalues
    ``-mu_k = -(2 - 2 cos(pi k / n))/dx^2``), applied via the FFT of the even
    extension. Same usage as the Dirichlet/periodic variants; ``n`` a power
    of two keeps the length-2n FFT fast.
    """
    k = np.arange(n)
    mu = (2.0 - 2.0 * np.cos(np.pi * k / n)) / dx**2
    # host-side numpy constants: eager complex device arrays captured in a
    # jitted closure fail the axon TPU backend's constant-embedding path
    denom = (1.0 + nu * float(dt) * mu).astype(np.complex64)
    fwd_phase = np.exp(-1j * np.pi * np.arange(n) / (2 * n)).astype(np.complex64)
    inv_phase = np.conj(fwd_phase)

    def apply(v):
        ext = jnp.concatenate([v, v[..., ::-1]], axis=-1)
        coeff = (jnp.fft.fft(ext, axis=-1)[..., :n] * fwd_phase).real / 2.0
        x_half = 2.0 * (coeff.astype(np.complex64) / denom) * inv_phase
        x_full = jnp.concatenate(
            [
                x_half,
                jnp.zeros(x_half.shape[:-1] + (1,), x_half.dtype),
                jnp.conj(x_half[..., 1:][..., ::-1]),
            ],
            axis=-1,
        )
        return jnp.fft.ifft(x_full, axis=-1).real[..., :n].astype(v.dtype)

    return apply


def jacobi_preconditioner(operator, y_like, *, probes=None, key=0, floor=1e-12):
    """General fallback: diagonal (Jacobi) inverse of an arbitrary linear
    operator ``v -> A v`` (typically ``A = I - c*dt*J`` for the Krylov
    steppers), for problems with no exploitable structure.

    ``probes=None`` extracts the EXACT diagonal with D basis matvecs (one
    vmapped batch — fine up to D ~ a few thousand); ``probes=k`` uses the
    Hutchinson diagonal estimator ``diag(A) ~ mean_z [z (.) A z]`` with k
    Rademacher probes (exact for diagonal A with a single probe; accurate for
    diagonally dominant A). Entries with ``|d| < floor`` fall back to 1 (the
    identity) so a zero estimate can never blow up the solve.

    The right tool when the stiffness is a per-component rate spread (chemical
    networks, broad relaxation spectra); for operators whose stiffness lives
    in off-diagonal coupling (diffusion), use the spectral inverses above.
    """
    import jax

    y = jnp.asarray(y_like)
    d = int(np.prod(y.shape))
    flat = lambda v: jnp.reshape(v, (-1,))

    if probes is not None and int(probes) < 1:
        raise ValueError(
            f"probes={probes}: need at least one Hutchinson probe (the "
            "mean over zero probes is NaN and would silently poison the "
            "preconditioned solve); use probes=None for the exact diagonal"
        )
    if probes is None:
        eye = jnp.eye(d, dtype=y.dtype)
        cols = jax.vmap(lambda e: flat(operator(jnp.reshape(e, y.shape))))(eye)
        diag = jnp.diagonal(cols)
    else:
        if isinstance(key, int):
            key = jax.random.key(key)
        z = jax.random.rademacher(key, (int(probes), d), dtype=y.dtype)
        az = jax.vmap(lambda zz: flat(operator(jnp.reshape(zz, y.shape))))(z)
        diag = jnp.mean(z * az, axis=0)

    safe = jnp.where(jnp.abs(diag) < floor, jnp.ones_like(diag), diag)

    def apply(v):
        return jnp.reshape(flat(v) / safe.astype(v.dtype), jnp.shape(v))

    return apply
