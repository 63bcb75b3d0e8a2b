"""Constraint-set evolution: per-constraint fingerprints, deltas, and
the policy for selectively re-validating completed partitions.

`fingerprint_set` is all-or-nothing: ANY rule edit invalidates every
completed partition, so adding ONE constraint to a validated 10^12-row
table re-runs all K constraints — including K-1 unchanged table checks,
each a shuffle — plus the whole violation re-sink. Constraint outputs
are independent by construction (every violation row carries its
constraint_id; table checks don't interact), so the correct unit of
invalidation is the CONSTRAINT, not the set:

* `constraint_fingerprints(reg, root)` — per-TOP-LEVEL-constraint
  canonical hash, closed over referenced sets (editing a set a Ref/AnyOf
  reaches changes the fingerprint of every constraint that can reach
  it), plus its level ("row" | "table") so a later delta knows whether
  the row verdict must be re-derived even for constraints that no
  longer exist in the new registry.
* `constraint_delta(old, new)` — added / removed / changed / unchanged
  by name, with `touches_row_level` (old OR new side).
* `subset_registry(reg, root, names)` — a compilable registry holding
  just the delta constraints (+ their referenced-set closure), which is
  what actually runs against completed partitions.

The runner half (operators/runner.evolve_checkpointed_validation)
applies the policy per completed partition: removed/changed constraint
rows are dropped from the violation parquet by constraint_id (no
recompute), added/changed constraints re-run ALONE, and the per-row
verdict metrics re-derive with one scan only when a row-level
constraint is touched — row predicates are codegen'd, shuffle-free, so
that scan costs orders of magnitude less than re-running the unchanged
table checks it replaces.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Set

from . import constraints as C
from .compiler import Registry, encode_constraint

ROW = "row"
TABLE = "table"


def _constraint_refs(c: C.Constraint) -> Set[str]:
    """Set names reachable from ONE constraint (Ref targets, through
    AnyOf/When nesting) — the direct edges of its closure."""
    out: Set[str] = set()
    if isinstance(c, C.Ref):
        out.add(c.target)
    elif isinstance(c, C.AnyOf):
        for b in c.branches:
            out |= _constraint_refs(b)
    elif isinstance(c, C.When) and c.inner is not None:
        out |= _constraint_refs(c.inner)
    return out


def constraint_fingerprints(reg: Registry, root: str) -> Dict[str, Dict[str, str]]:
    """{name: {"fp": sha256, "level": "row"|"table"}} for every
    top-level constraint of ``root``. The hash covers the constraint's
    own encoding plus the encodings of every set transitively reachable
    from its Refs, so cross-set edits propagate exactly as far as they
    semantically reach — and no further."""
    cs = reg._sets[root]
    out: Dict[str, Dict[str, str]] = {}
    for c in cs.constraints:
        closure: Dict[str, list] = {}
        todo = sorted(_constraint_refs(c))
        while todo:
            name = todo.pop()
            if name in closure or name not in reg._sets:
                continue
            ref_cs = reg._sets[name]
            closure[name] = [encode_constraint(x) for x in ref_cs.constraints]
            todo.extend(reg._refs_of(ref_cs))
        blob = json.dumps(
            {"v": 1, "c": encode_constraint(c), "sets": closure},
            sort_keys=True,
        )
        out[c.name] = {
            "fp": hashlib.sha256(blob.encode()).hexdigest(),
            "level": TABLE if isinstance(c, C.TABLE_LEVEL) else ROW,
        }
    return out


@dataclass
class Delta:
    added: List[str] = field(default_factory=list)
    removed: List[str] = field(default_factory=list)
    changed: List[str] = field(default_factory=list)
    unchanged: List[str] = field(default_factory=list)
    touches_row_level: bool = False

    @property
    def touched(self) -> List[str]:
        """Names whose existing violation rows are stale (must drop) or
        whose checks must (re)run."""
        return self.added + self.removed + self.changed

    @property
    def rerun(self) -> List[str]:
        """Names whose checks run against completed partitions."""
        return self.added + self.changed

    def is_noop(self) -> bool:
        return not self.touched

    def to_dict(self) -> Dict:
        return {
            "added": self.added,
            "removed": self.removed,
            "changed": self.changed,
            "unchanged": self.unchanged,
            "touches_row_level": self.touches_row_level,
        }


def constraint_delta(
    old: Dict[str, Dict[str, str]], new: Dict[str, Dict[str, str]]
) -> Delta:
    """Compare two `constraint_fingerprints` maps. A rename shows up as
    removed+added (correct: its old rows drop, its new check runs)."""
    d = Delta()
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None:
            d.added.append(name)
        elif n is None:
            d.removed.append(name)
        elif o["fp"] != n["fp"]:
            d.changed.append(name)
        else:
            d.unchanged.append(name)
    d.touches_row_level = any(
        (old.get(n) or new.get(n))["level"] == ROW for n in d.touched
    )
    return d


def subset_registry(
    reg: Registry, root: str, names: Sequence[str]
) -> Registry:
    """A registry whose root holds ONLY ``names``' constraints (plus the
    referenced-set closure) — compile it against the partition schema to
    run just the delta. Compiles under allow_isolated semantics-free:
    the closure is exactly what the chosen constraints reach."""
    cs = reg._sets[root]
    chosen = tuple(c for c in cs.constraints if c.name in set(names))
    sub = Registry().register(C.ConstraintSet(root, chosen))
    todo: List[str] = []
    for c in chosen:
        todo.extend(_constraint_refs(c))
    seen: Set[str] = set()
    while todo:
        name = todo.pop()
        if name in seen or name not in reg._sets:
            continue
        seen.add(name)
        ref_cs = reg._sets[name]
        sub.register(ref_cs)
        todo.extend(reg._refs_of(ref_cs))
    return sub
