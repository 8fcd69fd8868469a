"""Itô ↔ Stratonovich drift conversion.

The reference has no notion of either calculus (its sdeint is a broken
Euler–Maruyama, ``paddlexde/functional/sdeint.py:9-37`` in
DrownFish19/PaddleXDE). This repo's zoo spans both — euler/milstein/sra1/
sriw1/taylor15 solve ITÔ equations, heun_stratonovich/reversible_heun solve
STRATONOVICH ones — so the missing piece is moving a model between them:

    f_strat = f_ito − ½ Σ_j (∂G_{·j}/∂y)·G_{·j}        (and + for the inverse)

(for diagonal noise the sum collapses to the elementwise ½·g·∂g/∂y). The
correction is the same nested-jvp move the Taylor schemes use — exact
forward-mode derivatives of whatever traced diffusion the caller has, no
symbolic work.

Pinned (tests/functional/test_calculus.py): converting Itô GBM and solving
with heun_stratonovich reproduces the ITÔ closed form on the same path;
the round trip is the identity to machine precision; the matrix form
matches the hand-derived correction of a linear system.
"""

from __future__ import annotations

import jax

from .sdeint import noise_drift_correction

__all__ = ["ito_to_stratonovich", "stratonovich_to_ito"]


def ito_to_stratonovich(drift, diffusion, *, noise: str = "diagonal"):
    """Return the STRATONOVICH drift of the Itô SDE ``(drift, diffusion)``.

    Solve the returned ``(f_strat, diffusion)`` with a Stratonovich scheme
    (``heun_stratonovich`` / ``reversible_heun``) to get the same process
    the Itô pair describes under euler/milstein/....

    Args:
        noise: 'diagonal' (g has y's shape, diagonal Jacobian — sdeint's
            default contract), 'scalar' (one channel, arbitrary coupled g —
            taylor15's contract), or 'general' (matrix ``G -> [..., D, M]``).
    """
    corr = noise_drift_correction(diffusion, noise)

    def f_strat(t, y):
        return jax.tree.map(
            lambda f, c: f - 0.5 * c, drift(t, y), corr(t, y)
        )

    return f_strat


def stratonovich_to_ito(drift, diffusion, *, noise: str = "diagonal"):
    """Return the ITÔ drift of the Stratonovich SDE ``(drift, diffusion)``
    (the ``+½`` direction; see :func:`ito_to_stratonovich`)."""
    corr = noise_drift_correction(diffusion, noise)

    def f_ito(t, y):
        return jax.tree.map(
            lambda f, c: f + 0.5 * c, drift(t, y), corr(t, y)
        )

    return f_ito
