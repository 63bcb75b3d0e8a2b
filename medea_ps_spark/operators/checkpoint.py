"""Checkpoint manifest + resume (north rule: "resumable from checkpoint
with per-partition lineage + metrics").

A validation run over a partitioned table records, per partition value,
a manifest entry with lineage (input snapshot id, partition spec,
constraint-set fingerprint) and the partition's verdict metrics. On
resume, partitions whose entry matches (same snapshot + same constraint
fingerprint + status=done) are skipped; everything else re-runs.
Writes are atomic (temp file + rename) so a killed driver never leaves
a torn manifest. Violation outputs go to per-partition subdirectories,
so completed partitions' outputs are immutable across resumes.

With Iceberg available, ``snapshot_id`` is the Iceberg snapshot; the
parquet fallback fingerprints the partition directory listing
(file names + sizes + mtimes) — a content-addressed stand-in.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_NAME = "manifest.json"

# Sink-mode coverage lattice: an entry completed at rank R satisfies any
# request at rank <= R ("rows" materializes everything "sampled" does,
# which materializes everything "metrics" does). Unknown modes rank -1
# so they never satisfy anything (forward-compat: reprocess).
_SINK_RANK = {"metrics": 0, "sampled": 1, "rows": 2}


@dataclass
class PartitionEntry:
    partition: str
    snapshot_id: str
    fingerprint: str  # constraint-set hash (plans/compiler.fingerprint_set)
    status: str = "pending"  # pending | done | failed
    metrics: Dict = field(default_factory=dict)
    finished_at: Optional[float] = None
    # what the completed run materialized, ordered by coverage
    # (checkpoint._SINK_RANK): "rows" wrote the full violation parquet;
    # "sampled" wrote capped exemplars + exact per-constraint counts;
    # "metrics" wrote counts only. A rerun requesting MORE than the
    # entry materialized must not skip it — e.g. a row-sink rerun
    # reprocesses metrics-only entries because their violation rows
    # were never written (ADVICE r4). Manifests from before this field
    # default to "rows" (the historical mode).
    sink: str = "rows"


@dataclass
class Manifest:
    run_id: str
    table: str
    partition_col: str
    fingerprint: str
    entries: Dict[str, PartitionEntry] = field(default_factory=dict)
    # per-constraint {name: {"fp": ..., "level": "row"|"table"}} of the
    # set this manifest's `fingerprint` hashes — what evolution deltas
    # compare against (plans/evolution.py). Empty on pre-evolution
    # manifests, which then fall back to full invalidation.
    constraint_fps: Dict[str, Dict[str, str]] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "run_id": self.run_id,
                "table": self.table,
                "partition_col": self.partition_col,
                "fingerprint": self.fingerprint,
                "constraint_fps": self.constraint_fps,
                "entries": {k: asdict(v) for k, v in self.entries.items()},
            },
            sort_keys=True,
            indent=1,
        )

    @classmethod
    def from_json(cls, blob: str) -> "Manifest":
        raw = json.loads(blob)
        m = cls(
            run_id=raw["run_id"],
            table=raw["table"],
            partition_col=raw["partition_col"],
            fingerprint=raw["fingerprint"],
            constraint_fps=raw.get("constraint_fps", {}),
        )
        m.entries = {k: PartitionEntry(**v) for k, v in raw["entries"].items()}
        return m


def _atomic_write(path: str, data: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def snapshot_id_for(path: str, partition_dir: Optional[str] = None) -> str:
    """Parquet-fallback lineage: hash of the partition's file listing.
    (Iceberg path: use the table's snapshot id instead.)"""
    target = os.path.join(path, partition_dir) if partition_dir else path
    h = hashlib.sha256()
    if os.path.isdir(target):
        for root, _dirs, files in sorted(os.walk(target)):
            for name in sorted(files):
                if name.endswith((".crc", "_SUCCESS")):
                    continue
                p = os.path.join(root, name)
                st = os.stat(p)
                h.update(f"{os.path.relpath(p, target)}:{st.st_size}".encode())
    else:
        h.update(target.encode())
    return h.hexdigest()[:16]


class CheckpointedRun:
    """Drives a per-partition validation with skip-completed resume."""

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        checkpoint_dir: str,
        fingerprint: str,
        partition_col: str = "source",
        run_id: str = "run",
    ):
        self.spark = spark
        self.table_path = table_path
        self.checkpoint_dir = checkpoint_dir
        self.partition_col = partition_col
        self.manifest_path = os.path.join(checkpoint_dir, MANIFEST_NAME)
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                self.manifest = Manifest.from_json(fh.read())
            # a changed constraint set invalidates every completed entry
            if self.manifest.fingerprint != fingerprint:
                self.manifest = Manifest(
                    run_id, table_path, partition_col, fingerprint
                )
        else:
            self.manifest = Manifest(run_id, table_path, partition_col, fingerprint)

    def _save(self) -> None:
        _atomic_write(self.manifest_path, self.manifest.to_json())

    def partitions(self) -> List[str]:
        root = self.table_path
        prefix = f"{self.partition_col}="
        return sorted(
            d[len(prefix):]
            for d in os.listdir(root)
            if d.startswith(prefix) and os.path.isdir(os.path.join(root, d))
        )

    def pending_partitions(
        self, sink: str = "rows", min_violation_limit: Optional[int] = None
    ) -> List[str]:
        """Partitions needing (re)processing for the requested ``sink``
        mode. An entry satisfies the request iff it is done at the same
        snapshot+fingerprint AND its recorded sink covers the request
        under the ``_SINK_RANK`` lattice: "rows" covers everything;
        "sampled" covers sampled and metrics requests; "metrics" covers
        only metrics — so a row-mode rerun reprocesses metrics-only and
        sampled partitions and actually materializes their full
        violation rows.

        ``min_violation_limit`` refines sampled-vs-sampled coverage: a
        sampled request at limit N is satisfied by a sampled entry only
        if that entry was written at limit >= N (its exemplar set is a
        superset — "at most N" semantics); a SMALLER recorded limit
        means the requested exemplars were never materialized, so the
        partition reprocesses. Row entries cover any limit."""
        want = _SINK_RANK.get(sink, _SINK_RANK["rows"])
        out = []
        for p in self.partitions():
            snap = snapshot_id_for(self.table_path, f"{self.partition_col}={p}")
            e = self.manifest.entries.get(p)
            if (
                e is None
                or e.status != "done"
                or e.snapshot_id != snap
                or e.fingerprint != self.manifest.fingerprint
                or _SINK_RANK.get(e.sink, -1) < want
                or (
                    min_violation_limit is not None
                    and e.sink == "sampled"
                    and int(e.metrics.get("violation_limit") or 0)
                    < min_violation_limit
                )
            ):
                out.append(p)
        return out

    def run(
        self,
        process: Callable[[DataFrame, str], Dict],
        sink: str = "rows",
        min_violation_limit: Optional[int] = None,
    ) -> Dict[str, Dict]:
        """``process(partition_df, out_dir) -> metrics`` per pending
        partition. Partition pruning: the read targets exactly one
        partition directory, so the scan never touches completed data.
        ``sink`` labels what ``process`` materializes ("rows" |
        "sampled" | "metrics") and is recorded per entry for mode-aware
        resume; ``min_violation_limit`` is the sampled-request limit
        (see :meth:`pending_partitions`)."""
        results: Dict[str, Dict] = {}
        for p in self.pending_partitions(
            sink=sink, min_violation_limit=min_violation_limit
        ):
            pdir = f"{self.partition_col}={p}"
            snap = snapshot_id_for(self.table_path, pdir)
            # reading a leaf partition dir drops the partition column —
            # restore it as a literal (constant within the partition)
            df = self.spark.read.parquet(
                os.path.join(self.table_path, pdir)
            ).withColumn(self.partition_col, F.lit(p))
            out_dir = os.path.join(self.checkpoint_dir, "out", pdir)
            metrics = process(df, out_dir)
            self.manifest.entries[p] = PartitionEntry(
                partition=p,
                snapshot_id=snap,
                fingerprint=self.manifest.fingerprint,
                status="done",
                metrics=metrics,
                finished_at=time.time(),
                sink=sink,
            )
            self._save()
            results[p] = metrics
        return results
