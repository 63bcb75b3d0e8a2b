"""Corpus datasheet — the "data card" a training-data release ships
with (Gebru et al., "Datasheets for Datasets", CACM 2021): one
JSON-able summary of size, composition, duplication, text-quality and
token statistics. Everything here is a COMPOSITION of the engine's
existing single-pass primitives; the module's job is to bound the
number of actions and keep every one of them partial-aggregate-shaped.

Works on BOTH corpus shapes: a text table (documents) and the
north-rule token table (sequences) — text-derived stats appear only
when ``text_col`` exists; duplication falls back to token-array
fingerprints; length quantiles measure chars or tokens accordingly.

Scale design
------------
* At most FOUR bounded Spark actions, each one scan + one
  partial+final aggregate (the per-group ones shuffle |groups| rows):
  1. global scalars (counts, char/token moments, quality ratios,
     approx distinct fingerprints — HLL, so duplication rate needs no
     join or second scan);
  2. per-source composition (top ``max_groups`` by docs, exact);
  3. per-language composition (same shape);
  4. length quantiles (one mergeable percentile_approx sketch).
* Nothing doc-sized ever reaches the driver — only the aggregate rows.
* ``approx`` duplication uses HLL (±rsd); pass ``exact_dups=True``
  only when an exact count_distinct shuffle of 16-byte digests is
  acceptable (it usually is — digests, not documents, shuffle).
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..functions.text import normalize, punct_ratio, stopword_ratio, token_count


def corpus_datasheet(
    df: DataFrame,
    text_col: Optional[str] = "text",
    id_col: str = "doc_id",
    source_col: Optional[str] = None,
    lang_col: Optional[str] = None,
    tokens_col: Optional[str] = None,
    max_groups: int = 50,
    exact_dups: bool = False,
    rsd: float = 0.01,
) -> dict:
    """Build the datasheet dict. Keys: ``corpus`` (global scalars),
    ``duplication`` (fingerprint-distinct rates), ``length_quantiles``,
    and optionally ``sources`` / ``languages`` (top-``max_groups``
    compositions) and ``tokens`` stats. Column args that don't exist
    in ``df`` are skipped (so one call fits both table shapes)."""
    has_text = text_col is not None and text_col in df.columns
    has_toks = tokens_col is not None and tokens_col in df.columns

    # content fingerprint: normalized text, else the exact token array
    if has_text:
        fp = F.md5(normalize(F.col(text_col)))
    elif has_toks:
        fp = F.when(
            F.col(tokens_col).isNull(), F.lit(None)
        ).otherwise(
            # ADVICE r5: concat_ws silently skips NULL elements, which
            # would fingerprint [1,NULL,2] and [1,2] identically and
            # inflate duplicate_rate — map NULLs to a sentinel first
            F.md5(F.concat_ws(",", F.transform(
                F.col(tokens_col),
                lambda t: F.coalesce(t.cast("string"), F.lit("\u0000")),
            )))
        )
    else:
        fp = None

    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col(id_col)).alias("n_distinct_ids"),
    ]
    if has_text:
        txt = F.col(text_col)
        n_chars = F.length(txt)
        aggs += [
            F.count(txt).alias("n_docs_with_text"),
            F.sum(n_chars.cast("bigint")).alias("total_chars"),
            F.round(F.avg(n_chars), 2).alias("avg_chars"),
            F.round(F.avg(token_count(txt)), 2).alias("avg_ws_tokens"),
            F.round(F.avg(punct_ratio(txt)), 6).alias("avg_punct_ratio"),
            F.round(F.avg(stopword_ratio(txt)), 6).alias(
                "avg_stopword_ratio"
            ),
        ]
    if has_toks:
        toks = F.col(tokens_col)
        # size(NULL) is -1 under spark.sql.legacy.sizeOfNull — make the
        # NULL-array contribution explicit (0 to the sum, absent from
        # the mean) so the sheet is config-independent
        sz = F.when(toks.isNull(), F.lit(None)).otherwise(F.size(toks))
        aggs += [
            F.sum(F.coalesce(sz, F.lit(0)).cast("bigint")).alias(
                "total_tokens"
            ),
            F.round(F.avg(sz), 2).alias("avg_tokens_per_doc"),
        ]
    if fp is not None:
        aggs += [
            F.count(fp).alias("n_docs_with_content"),
            (
                F.countDistinct(fp)
                if exact_dups
                else F.approx_count_distinct(fp, rsd)
            ).alias("distinct_fingerprints"),
        ]
    g = df.agg(*aggs).collect()[0].asDict()

    n = g["n_rows"] or 1
    corpus = {"n_rows": g["n_rows"], "n_distinct_ids": g["n_distinct_ids"]}
    for k in (
        "n_docs_with_text", "total_chars", "avg_chars", "avg_ws_tokens",
        "avg_punct_ratio", "avg_stopword_ratio",
    ):
        if k in g:
            corpus[k] = g[k]
    sheet: dict = {"corpus": corpus}
    if fp is not None:
        nc = g["n_docs_with_content"]
        sheet["duplication"] = {
            "method": "exact" if exact_dups else f"hll(rsd={rsd})",
            "fingerprint": "text" if has_text else "tokens",
            "distinct_fingerprints": g["distinct_fingerprints"],
            # rate among docs that HAVE content (fingerprints skip NULL)
            "duplicate_rate": (
                0.0
                if not nc
                else round(
                    max(0.0, 1.0 - g["distinct_fingerprints"] / nc), 6
                )
            ),
        }
    if has_toks:
        sheet["tokens"] = {
            "total_tokens": g["total_tokens"],
            "avg_tokens_per_doc": g["avg_tokens_per_doc"],
        }

    for key, col in (("sources", source_col), ("languages", lang_col)):
        if col is None or col not in df.columns:
            continue
        rows = (
            df.groupBy(F.col(col).alias("group"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("group"))
            .limit(max_groups)
            .collect()
        )
        sheet[key] = [
            {
                "group": r["group"],
                "n_docs": r["n_docs"],
                "share": round(r["n_docs"] / n, 6),
            }
            for r in rows
        ]

    measure = None
    if has_text:
        measure = ("n_chars", F.length(F.col(text_col)).cast("double"))
    elif has_toks:
        measure = (
            "n_tok",
            F.when(F.col(tokens_col).isNull(), F.lit(None))
            .otherwise(F.size(F.col(tokens_col)))
            .cast("double"),
        )
    if measure is not None:
        qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        quant = df.agg(
            F.percentile_approx(measure[1], qs, 10_000).alias("q")
        ).collect()[0]["q"]
        sheet["length_quantiles"] = {
            "measure": measure[0],
            **{
                f"p{int(p * 100)}": (None if v is None else int(v))
                for p, v in zip(qs, quant or [None] * len(qs))
            },
        }
    return sheet


def write_datasheet(sheet: dict, path: str) -> None:
    """Persist the datasheet as pretty JSON (driver-side — the sheet is
    a few KB by construction)."""
    with open(path, "w") as f:
        json.dump(sheet, f, indent=2, sort_keys=True)
        f.write("\n")
