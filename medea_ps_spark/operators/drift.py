"""Distribution-drift tests against a reference profile — χ² and KS
over fixed-edge histogram sketches (north-rule operators, SURVEY.md
§2D). The heavy lifting (bucket counting) is a one-pass Spark hash agg;
the test statistic runs driver-side on ≤ nbuckets aggregated values
(functions/stats_math.py, no scipy dependency).

The profile's bucket edges are FIXED at profile-build time so the χ²
bucketing is deterministic across epochs and parallelism levels
(SURVEY.md §7 'Drift-test state').
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
from pyspark.sql import DataFrame

from ..functions.stats_math import chi2_sf, ks_2samp_pvalue
from .sketches import histogram, token_histogram


@dataclass
class ColumnProfile:
    column: str
    lo: float
    hi: float
    nbuckets: int
    counts: List[int]

    @property
    def n(self) -> int:
        return int(sum(self.counts))


class ReferenceProfile:
    """FIXTURES.md §3: per-column sketch of a clean epoch."""

    def __init__(self, columns: Optional[Dict[str, ColumnProfile]] = None):
        self.columns = columns or {}

    def to_json(self) -> str:
        return json.dumps(
            {
                name: {
                    "column": p.column,
                    "lo": p.lo,
                    "hi": p.hi,
                    "nbuckets": p.nbuckets,
                    "counts": p.counts,
                }
                for name, p in self.columns.items()
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, blob: str) -> "ReferenceProfile":
        raw = json.loads(blob)
        return cls({k: ColumnProfile(**v) for k, v in raw.items()})


def _counts_vector(hist_df: DataFrame, nbuckets: int) -> np.ndarray:
    counts = np.zeros(nbuckets, dtype=np.float64)
    for r in hist_df.collect():  # ≤ nbuckets rows
        counts[r["bucket"]] = r["bucket_count"]
    return counts


def build_profile(
    df: DataFrame,
    specs: Dict[str, Dict],
) -> ReferenceProfile:
    """specs: name → {column | token_array, lo, hi, nbuckets}. Each named
    sketch is one aggregation pass over the clean epoch."""
    prof = ReferenceProfile()
    for name, s in specs.items():
        nb = s.get("nbuckets", 64)
        if "token_array" in s:
            h = token_histogram(df, s["token_array"], vocab=int(s["hi"]), nbuckets=nb)
            col = s["token_array"]
        else:
            h = histogram(df, s["column"], s["lo"], s["hi"], nb)
            col = s["column"]
        counts = _counts_vector(h, nb)
        prof.columns[name] = ColumnProfile(
            column=col, lo=float(s["lo"]), hi=float(s["hi"]), nbuckets=nb,
            counts=[int(x) for x in counts],
        )
    return prof


def chi2_drift(
    df: DataFrame,
    profile: ReferenceProfile,
    name: str,
    token_array: bool = False,
) -> Dict:
    """Pearson χ² of the current epoch's bucket counts vs the profile,
    expected scaled to the current total. Returns a verdict dict."""
    p = profile.columns[name]
    if token_array:
        h = token_histogram(df, p.column, vocab=int(p.hi), nbuckets=p.nbuckets)
    else:
        h = histogram(df, p.column, p.lo, p.hi, p.nbuckets)
    obs = _counts_vector(h, p.nbuckets)
    exp = np.array(p.counts, dtype=np.float64)
    n_obs, n_exp = obs.sum(), exp.sum()
    if n_obs == 0 or n_exp == 0:
        return {"name": name, "test": "chi2", "stat": float("nan"), "pvalue": 0.0}
    # TWO-sample χ²: the profile is itself a finite sample, not the true
    # distribution — the one-sample form would double-count its variance
    # and flag identical distributions at large n.
    #   stat = Σ (K1·o − K2·e)² / (o+e),  K1=√(n_e/n_o), K2=√(n_o/n_e)
    # merge sparse buckets (o+e < 10) into one overflow bin first.
    keep = (obs + exp) >= 10.0
    o = np.append(obs[keep], obs[~keep].sum())
    e = np.append(exp[keep], exp[~keep].sum())
    mask = (o + e) > 0
    o, e = o[mask], e[mask]
    k1 = math.sqrt(n_exp / n_obs)
    k2 = math.sqrt(n_obs / n_exp)
    stat = float(((k1 * o - k2 * e) ** 2 / (o + e)).sum())
    dof = max(1, len(o) - 1)
    return {
        "name": name,
        "test": "chi2",
        "stat": stat,
        "dof": dof,
        "pvalue": chi2_sf(stat, dof),
        "n": int(n_obs),
    }


def _psi_from_counts(obs: np.ndarray, exp: np.ndarray, eps: float) -> float:
    """PSI = Σ (p_obs − p_exp)·ln(p_obs/p_exp) over the fixed buckets.
    Proportions are floored at eps (the standard guard for empty
    buckets — a 0→anything move would otherwise be ±inf) and
    renormalized so both vectors stay distributions; identical counts
    give exactly 0.0 either way."""
    po = np.maximum(obs / obs.sum(), eps)
    pe = np.maximum(exp / exp.sum(), eps)
    po, pe = po / po.sum(), pe / pe.sum()
    return float(((po - pe) * np.log(po / pe)).sum())


def psi_band(stat: float) -> str:
    """The conventional PSI reading: <0.1 stable, 0.1–0.25 moderate
    shift (investigate), >0.25 major shift (act)."""
    if math.isnan(stat):
        return "undefined"
    if stat < 0.1:
        return "stable"
    if stat <= 0.25:
        return "moderate"
    return "major"


def psi_drift(
    df: DataFrame,
    profile: ReferenceProfile,
    name: str,
    token_array: bool = False,
    eps: float = 1e-4,
    threshold: float = 0.25,
) -> Dict:
    """Population Stability Index of the current epoch vs the profile —
    the credit-scoring industry's scale-free drift magnitude (a
    symmetrized KL over the fixed histogram buckets). Complements
    χ²/KS: those answer "is the shift statistically real?" (p-values
    shrink with n, so at 10^12 rows EVERYTHING is significant); PSI
    answers "is the shift big enough to matter?" independent of n.
    Same one-pass histogram sketch, driver-side math on ≤ nbuckets
    values."""
    p = profile.columns[name]
    if token_array:
        h = token_histogram(df, p.column, vocab=int(p.hi), nbuckets=p.nbuckets)
    else:
        h = histogram(df, p.column, p.lo, p.hi, p.nbuckets)
    obs = _counts_vector(h, p.nbuckets)
    exp = np.array(p.counts, dtype=np.float64)
    if obs.sum() == 0 or exp.sum() == 0:
        return {
            "name": name, "test": "psi", "stat": float("nan"),
            "band": "undefined", "drifted": True, "threshold": threshold,
        }
    stat = _psi_from_counts(obs, exp, eps)
    return {
        "name": name,
        "test": "psi",
        "stat": stat,
        "band": psi_band(stat),
        "n": int(obs.sum()),
        "drifted": bool(stat > threshold),
        "threshold": threshold,
    }


def psi_drift_by_partition(
    df: DataFrame,
    profile: ReferenceProfile,
    name: str,
    partition_col: str = "source",
    eps: float = 1e-4,
    threshold: float = 0.25,
):
    """Per-partition PSI verdicts from ONE grouped histogram aggregation
    (≤ nbuckets × |partitions| rows collected), mirroring
    chi2_drift_by_partition."""
    p = profile.columns[name]
    h = histogram(df, p.column, p.lo, p.hi, p.nbuckets, partition_col=partition_col)
    rows = h.collect()
    parts = sorted({r[partition_col] for r in rows})
    exp = np.array(p.counts, dtype=np.float64)
    out = []
    for part in parts:
        obs = np.zeros(p.nbuckets, dtype=np.float64)
        for r in rows:
            if r[partition_col] == part:
                obs[r["bucket"]] = r["bucket_count"]
        if obs.sum() == 0 or exp.sum() == 0:
            out.append({
                "partition": part, "name": name, "test": "psi",
                "stat": float("nan"), "band": "undefined",
                "drifted": True, "threshold": threshold,
            })
            continue
        stat = _psi_from_counts(obs, exp, eps)
        out.append({
            "partition": part, "name": name, "test": "psi", "stat": stat,
            "band": psi_band(stat), "n": int(obs.sum()),
            "drifted": bool(stat > threshold), "threshold": threshold,
        })
    return out


def ks_drift(
    df: DataFrame,
    profile: ReferenceProfile,
    name: str,
    token_array: bool = False,
) -> Dict:
    """Binned two-sample KS: D = max |ECDF_cur − ECDF_ref| over the fixed
    bucket edges (exact for the binned distributions; a deterministic,
    shuffle-free approximation of the sample KS)."""
    p = profile.columns[name]
    if token_array:
        h = token_histogram(df, p.column, vocab=int(p.hi), nbuckets=p.nbuckets)
    else:
        h = histogram(df, p.column, p.lo, p.hi, p.nbuckets)
    obs = _counts_vector(h, p.nbuckets)
    exp = np.array(p.counts, dtype=np.float64)
    n_obs, n_exp = obs.sum(), exp.sum()
    if n_obs == 0 or n_exp == 0:
        return {"name": name, "test": "ks", "stat": float("nan"), "pvalue": 0.0}
    d = float(np.abs(np.cumsum(obs) / n_obs - np.cumsum(exp) / n_exp).max())
    return {
        "name": name,
        "test": "ks",
        "stat": d,
        "pvalue": ks_2samp_pvalue(d, n_obs, n_exp),
        "n": int(n_obs),
    }


def chi2_drift_by_partition(
    df: DataFrame,
    profile: ReferenceProfile,
    name: str,
    partition_col: str = "source",
    alpha: float = 0.001,
):
    """Per-PARTITION drift verdicts (north star: per-partition pass/fail):
    one hash-agg computes every partition's bucket counts (≤ nbuckets ×
    |partitions| rows collected); the χ² per partition runs driver-side
    on those sketches. Returns a list of verdict dicts, one per
    partition value."""
    p = profile.columns[name]
    h = histogram(df, p.column, p.lo, p.hi, p.nbuckets, partition_col=partition_col)
    rows = h.collect()
    parts = sorted({r[partition_col] for r in rows})
    exp = np.array(p.counts, dtype=np.float64)
    n_exp = exp.sum()
    out = []
    for part in parts:
        obs = np.zeros(p.nbuckets, dtype=np.float64)
        for r in rows:
            if r[partition_col] == part:
                obs[r["bucket"]] = r["bucket_count"]
        n_obs = obs.sum()
        if n_obs == 0 or n_exp == 0:
            out.append({"partition": part, "stat": float("nan"), "pvalue": 0.0})
            continue
        keep = (obs + exp) >= 10.0
        o = np.append(obs[keep], obs[~keep].sum())
        e = np.append(exp[keep], exp[~keep].sum())
        mask = (o + e) > 0
        o, e = o[mask], e[mask]
        k1 = math.sqrt(n_exp / n_obs)
        k2 = math.sqrt(n_obs / n_exp)
        stat = float(((k1 * o - k2 * e) ** 2 / (o + e)).sum())
        dof = max(1, len(o) - 1)
        pv = chi2_sf(stat, dof)
        out.append(
            {
                "partition": part,
                "name": name,
                "stat": stat,
                "dof": dof,
                "pvalue": pv,
                "n": int(n_obs),
                "drifted": bool(pv < alpha),
                "alpha": alpha,
            }
        )
    return out


def ks_drift_by_partition(
    df: DataFrame,
    profile: ReferenceProfile,
    name: str,
    partition_col: str = "source",
    alpha: float = 0.001,
):
    """Per-partition binned KS vs the profile — same single-agg sketch
    collection as chi2_drift_by_partition."""
    p = profile.columns[name]
    h = histogram(df, p.column, p.lo, p.hi, p.nbuckets, partition_col=partition_col)
    rows = h.collect()
    parts = sorted({r[partition_col] for r in rows})
    exp = np.array(p.counts, dtype=np.float64)
    n_exp = exp.sum()
    out = []
    for part in parts:
        obs = np.zeros(p.nbuckets, dtype=np.float64)
        for r in rows:
            if r[partition_col] == part:
                obs[r["bucket"]] = r["bucket_count"]
        n_obs = obs.sum()
        if n_obs == 0 or n_exp == 0:
            out.append({"partition": part, "stat": float("nan"), "pvalue": 0.0})
            continue
        d = float(np.abs(np.cumsum(obs) / n_obs - np.cumsum(exp) / n_exp).max())
        pv = ks_2samp_pvalue(d, n_obs, n_exp)
        out.append(
            {
                "partition": part, "name": name, "test": "ks", "stat": d,
                "pvalue": pv, "n": int(n_obs), "drifted": bool(pv < alpha),
                "alpha": alpha,
            }
        )
    return out


def quantile_drift(
    df: DataFrame,
    reference_quantiles: Dict[float, float],
    column: str,
    partition_col: str = "source",
    rel_tolerance: float = 0.25,
    compression: int = 200,
) -> Dict:
    """t-digest quantile-shift monitor: flags when any monitored
    quantile moves more than rel_tolerance from the reference profile.
    Complements χ²/KS (which need binning) with tail-aware checks."""
    from .sketches import merge_tdigests, tdigest_by_partition

    rows = tdigest_by_partition(df, column, partition_col, compression).collect()
    d = merge_tdigests([r["tdigest"] for r in rows], compression)
    verdicts = {}
    drifted = False
    for q, ref in reference_quantiles.items():
        got = d.quantile(q)
        rel = abs(got - ref) / max(abs(ref), 1e-12)
        verdicts[q] = {"reference": ref, "observed": got, "rel_change": rel}
        drifted = drifted or rel > rel_tolerance
    return {
        "column": column,
        "test": "quantile_shift",
        "quantiles": verdicts,
        "drifted": drifted,
        "rel_tolerance": rel_tolerance,
    }


def drift_verdicts(
    df: DataFrame,
    profile: ReferenceProfile,
    tests: List[Dict],
    alpha: float = 0.001,
) -> List[Dict]:
    """tests: [{name, test: chi2|ks|psi, token_array?: bool,
    threshold?: float}]. Verdict rows analogous to partition-level
    constraint results (χ²/KS: drifted = p<α; PSI: drifted =
    stat>threshold — PSI is a magnitude, not a significance test)."""
    out = []
    for t in tests:
        kind = t.get("test", "chi2")
        if kind == "psi":
            r = psi_drift(
                df, profile, t["name"],
                token_array=bool(t.get("token_array")),
                threshold=float(t.get("threshold", 0.25)),
            )
            out.append(r)
            continue
        fn = chi2_drift if kind == "chi2" else ks_drift
        r = fn(df, profile, t["name"], token_array=bool(t.get("token_array")))
        r["drifted"] = bool(r["pvalue"] < alpha)
        r["alpha"] = alpha
        out.append(r)
    return out
