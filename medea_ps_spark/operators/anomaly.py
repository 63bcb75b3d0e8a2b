"""Run-over-run metrics anomaly detection (Deequ-style).

The reference validates one document per call and keeps no history
(/root/reference/src/Data/Medea.purs:146-162). At 10^12-row production
scale the question shifts from "is this run clean?" to "does this run
look like the last thirty?": a sudden 10x jump in the violation RATE, a
row count that halves, a null rate that creeps — all pass absolute
checks while signalling upstream breakage. This module is the monitor
layer closing the engine's lifecycle loop:

    profile -> suggest -> compile -> validate -> evolve -> MONITOR

Design (public literature: Schelter et al., "Automating Large-Scale
Data Quality Verification", VLDB'18 — Deequ's MetricsRepository +
AnomalyDetection strategies):

* a **metrics history** is a directory of tiny per-run JSON files
  (one atomic file per run, like the checkpoint manifest) — the inputs
  are already-reduced scalars, so the store is kilobytes regardless of
  table size and everything here is driver-side pure Python; the
  10^12-row work already happened in the aggregates that produced the
  numbers;
* **strategies** are pure functions ``(history_values, new_value) ->
  (ok, detail)``: absolute bounds, relative rate-of-change vs the
  previous run, and k-sigma vs the trailing window (Welford mean/std);
* `metrics_from_manifest` derives a run's metric dict straight from a
  checkpoint manifest (operators/checkpoint.py), so a scheduled job is
  two calls: record this run, check it against history.

NULL/missing metrics are treated conservatively: a metric named in
``checks`` but absent from the new run is itself an anomaly
(``missing_metric``), because a silently-vanished measurement is
exactly the failure mode monitoring exists to catch.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

__all__ = [
    "AbsoluteBounds",
    "RateOfChange",
    "KSigma",
    "RunMetrics",
    "record_run_metrics",
    "load_history",
    "check_anomalies",
    "metrics_from_manifest",
]


# ---------------------------------------------------------------------------
# history store
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RunMetrics:
    run_id: str
    seq: int  # monotone position in the history (ordering key)
    metrics: Dict[str, float]
    tags: Dict[str, str]


def _history_dir(path: str) -> str:
    d = os.path.join(path, "metrics_history")
    os.makedirs(d, exist_ok=True)
    return d


def record_run_metrics(
    history_path: str,
    run_id: str,
    metrics: Dict[str, float],
    tags: Optional[Dict[str, str]] = None,
) -> None:
    """Append one run's metrics. One atomic JSON file per run (write to
    ``.tmp`` then ``os.replace``, same discipline as the checkpoint
    manifest); re-recording the same run_id overwrites it idempotently.
    ``seq`` is allocated as max(existing)+1 so ordering never depends on
    wall clocks or filename sorting."""
    d = _history_dir(history_path)
    existing = load_history(history_path)
    by_id = {r.run_id: r for r in existing}
    seq = (
        by_id[run_id].seq
        if run_id in by_id
        else (max((r.seq for r in existing), default=-1) + 1)
    )
    blob = json.dumps(
        {
            "run_id": run_id,
            "seq": seq,
            "metrics": {k: float(v) for k, v in metrics.items()},
            "tags": dict(tags or {}),
        },
        sort_keys=True,
    )
    target = os.path.join(d, f"{run_id}.json")
    tmp = target + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(blob)
    os.replace(tmp, target)


def load_history(history_path: str) -> List[RunMetrics]:
    """All recorded runs, ordered by ``seq`` (oldest first)."""
    d = _history_dir(history_path)
    out: List[RunMetrics] = []
    for name in os.listdir(d):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as fh:
            raw = json.load(fh)
        out.append(
            RunMetrics(
                run_id=raw["run_id"],
                seq=int(raw["seq"]),
                metrics={k: float(v) for k, v in raw["metrics"].items()},
                tags=dict(raw.get("tags", {})),
            )
        )
    out.sort(key=lambda r: (r.seq, r.run_id))
    return out


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AbsoluteBounds:
    """lo <= value <= hi (either bound optional)."""

    lo: Optional[float] = None
    hi: Optional[float] = None

    def evaluate(self, history: Sequence[float], value: float):
        ok = (self.lo is None or value >= self.lo) and (
            self.hi is None or value <= self.hi
        )
        return ok, {"lo": self.lo, "hi": self.hi}


@dataclass(frozen=True)
class RateOfChange:
    """Relative change vs the PREVIOUS run:
    ``-max_decrease <= (new - prev) / |prev| <= max_increase``.
    With no prior run the check passes (nothing to compare). A prev of
    exactly 0 uses absolute change against the same bounds (the
    conventional continuity fix — 0 -> 5 violations with
    max_increase=1.0 flags, 0 -> 0 passes)."""

    max_increase: Optional[float] = None  # e.g. 1.0 == +100%
    max_decrease: Optional[float] = None  # e.g. 0.5 == -50%

    def evaluate(self, history: Sequence[float], value: float):
        if not history:
            return True, {"prev": None}
        prev = history[-1]
        change = (value - prev) / abs(prev) if prev != 0 else (value - prev)
        ok = (self.max_increase is None or change <= self.max_increase) and (
            self.max_decrease is None or change >= -self.max_decrease
        )
        return ok, {"prev": prev, "change": round(change, 6)}


@dataclass(frozen=True)
class KSigma:
    """|value - mean(window)| <= k * std(window) over the trailing
    ``window`` history values (all history when None). Passes until
    ``min_history`` values exist — a 2-run "baseline" is noise, not a
    distribution. Zero-variance history flags ANY deviation (the
    baseline says the metric is constant)."""

    k: float = 3.0
    window: Optional[int] = None
    min_history: int = 5

    def evaluate(self, history: Sequence[float], value: float):
        vals = list(history[-self.window:] if self.window else history)
        if len(vals) < self.min_history:
            return True, {"n": len(vals), "reason": "insufficient_history"}
        mean = sum(vals) / len(vals)
        var = sum((v - mean) ** 2 for v in vals) / len(vals)
        std = math.sqrt(var)
        if std == 0.0:
            return value == mean, {"mean": mean, "std": 0.0}
        z = abs(value - mean) / std
        return z <= self.k, {"mean": round(mean, 6), "std": round(std, 6),
                             "z": round(z, 4)}


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def check_anomalies(
    history: Sequence[RunMetrics],
    new_metrics: Dict[str, float],
    checks: Dict[str, object],
) -> List[Dict]:
    """Evaluate ``checks`` (metric name -> strategy, or -> list of
    strategies) for one new run against the history. Returns one verdict
    dict per (metric, strategy):
    ``{"metric", "strategy", "ok", "value", "detail"}``; a metric named
    in checks but missing from ``new_metrics`` yields a failing
    ``missing_metric`` verdict."""
    out: List[Dict] = []
    for metric, strat in checks.items():
        strategies = strat if isinstance(strat, (list, tuple)) else [strat]
        series = [r.metrics[metric] for r in history if metric in r.metrics]
        if metric not in new_metrics:
            out.append(
                {
                    "metric": metric,
                    "strategy": "missing_metric",
                    "ok": False,
                    "value": None,
                    "detail": {"n_history": len(series)},
                }
            )
            continue
        value = float(new_metrics[metric])
        for s in strategies:
            ok, detail = s.evaluate(series, value)
            out.append(
                {
                    "metric": metric,
                    "strategy": type(s).__name__,
                    "ok": bool(ok),
                    "value": value,
                    "detail": detail,
                }
            )
    return out


def metrics_from_manifest(checkpoint_dir: str) -> Dict[str, float]:
    """One run's metric dict straight from a checkpoint manifest
    (operators/checkpoint.py): totals over done partitions —
    ``n_rows``, ``n_failed``, ``fail_rate``, ``n_partitions``, plus
    ``table_violations.<name>`` per table constraint (metrics-only
    entries record the per-constraint map) and their
    ``n_table_violations`` sum when present. Sampled-sink entries
    (runner ``violation_limit``) record an exact ``violation_counts``
    map over ALL constraints (row-level included); those lift as
    ``violation_counts.<name>`` plus their ``n_violations`` sum — the
    richest per-constraint signal for run-over-run drift — but ONLY
    when every done entry carries the map (a partial sum over a
    mixed-sink manifest would masquerade as a corpus total)."""
    from .checkpoint import MANIFEST_NAME, Manifest

    with open(os.path.join(checkpoint_dir, MANIFEST_NAME)) as fh:
        man = Manifest.from_json(fh.read())
    done = [e for e in man.entries.values() if e.status == "done"]
    out: Dict[str, float] = {
        "n_partitions": float(len(done)),
        "n_rows": float(sum(e.metrics.get("n_rows", 0) for e in done)),
        "n_failed": float(sum(e.metrics.get("n_failed", 0) for e in done)),
    }
    out["fail_rate"] = out["n_failed"] / out["n_rows"] if out["n_rows"] else 0.0
    per_constraint: Dict[str, float] = {}
    have_tv = False
    for e in done:
        tv = e.metrics.get("table_violations")
        if tv is None:
            continue
        have_tv = True
        for name, n in tv.items():
            per_constraint[name] = per_constraint.get(name, 0.0) + float(n)
    if have_tv:
        out["n_table_violations"] = sum(per_constraint.values())
        for name, n in per_constraint.items():
            out[f"table_violations.{name}"] = n
    # only publish the global-looking totals when EVERY done entry
    # carries the map — on a mixed-sink manifest (e.g. one partition
    # reprocessed sampled beside row-mode entries) a partial sum would
    # masquerade as a corpus total and fire spurious run-over-run
    # anomalies whenever the sink mix shifts
    vcs = [e.metrics.get("violation_counts") for e in done]
    if done and all(vc is not None for vc in vcs):
        per_any: Dict[str, float] = {}
        for vc in vcs:
            for name, n in vc.items():
                per_any[name] = per_any.get(name, 0.0) + float(n)
        out["n_violations"] = sum(per_any.values())
        for name, n in per_any.items():
            out[f"violation_counts.{name}"] = n
    return out
