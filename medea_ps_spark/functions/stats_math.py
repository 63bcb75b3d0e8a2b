"""Pure-Python special functions for drift p-values (no scipy in the
runtime image). Standard numerics: regularized incomplete gamma via
series / continued fraction (Lentz), and the asymptotic Kolmogorov
distribution. Driver-side only — these run on a handful of aggregated
sketch values, never per row."""

from __future__ import annotations

import math


def _gamma_series(a: float, x: float) -> float:
    """P(a,x) by series expansion (x < a+1)."""
    term = 1.0 / a
    total = term
    n = a
    for _ in range(500):
        n += 1.0
        term *= x / n
        total += term
        if abs(term) < abs(total) * 1e-15:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_cf(a: float, x: float) -> float:
    """Q(a,x) by continued fraction (modified Lentz, x >= a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def gammainc_q(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("gammainc_q domain")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return max(0.0, min(1.0, 1.0 - _gamma_series(a, x)))
    return max(0.0, min(1.0, _gamma_cf(a, x)))


def chi2_sf(stat: float, dof: int) -> float:
    """Survival function of the chi-square distribution."""
    if dof <= 0:
        raise ValueError("dof must be positive")
    if stat <= 0:
        return 1.0
    return gammainc_q(dof / 2.0, stat / 2.0)


def kolmogorov_sf(lam: float) -> float:
    """Q_KS(λ) = 2 Σ (-1)^{j-1} exp(-2 j² λ²) — asymptotic two-sided KS
    survival function."""
    if lam <= 0:
        return 1.0
    total = 0.0
    for j in range(1, 101):
        term = 2.0 * ((-1.0) ** (j - 1)) * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, total))


def ks_2samp_pvalue(d: float, n1: float, n2: float) -> float:
    """Two-sample KS p-value (asymptotic)."""
    en = math.sqrt(n1 * n2 / (n1 + n2))
    return kolmogorov_sf((en + 0.12 + 0.11 / en) * d)
