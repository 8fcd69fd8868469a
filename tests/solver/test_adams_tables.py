"""Exact re-derivation of the Adams coefficient tables.

Each table row is validated against the defining Lagrange-polynomial integrals
computed in exact rational arithmetic — this is what caught the corrupt
``_BASHFORTH[12][10]`` entry in the reference's data
(``fixed_solver/adams.py:9-441`` in DrownFish19/PaddleXDE).
"""

from fractions import Fraction

from paddlexde_tpu.solver.adams import _BASHFORTH, _DIVISOR, _MOULTON


def _poly_mul(a, b):
    out = [Fraction(0)] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] += ai * bj
    return out


def _poly_int01(p):
    return sum(c / (i + 1) for i, c in enumerate(p))


def _lagrange_weight(nodes, j):
    num = [Fraction(1)]
    den = Fraction(1)
    for i, ni in enumerate(nodes):
        if i == j:
            continue
        num = _poly_mul(num, [-ni, Fraction(1)])  # (u - n_i)
        den *= nodes[j] - ni
    return _poly_int01(num) / den


def test_bashforth_rows_exact():
    for k in range(1, 13):
        nodes = [Fraction(-j) for j in range(k)]  # f_{n-j} at u = -j
        for j in range(k):
            expected = _lagrange_weight(nodes, j)
            got = Fraction(_BASHFORTH[k][j], _DIVISOR[k])
            assert got == expected, (k, j, got, expected)


def test_moulton_rows_exact():
    for k in range(1, 13):
        nodes = [Fraction(1 - j) for j in range(k)]  # f_{n+1-j} at u = 1-j
        for j in range(k):
            expected = _lagrange_weight(nodes, j)
            got = Fraction(_MOULTON[k][j], _DIVISOR[k])
            assert got == expected, (k, j, got, expected)


def test_rows_sum_to_one():
    for k in range(1, 13):
        assert sum(Fraction(c, _DIVISOR[k]) for c in _BASHFORTH[k]) == 1
        assert sum(Fraction(c, _DIVISOR[k]) for c in _MOULTON[k]) == 1
