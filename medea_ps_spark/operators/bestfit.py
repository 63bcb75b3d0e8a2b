"""Best-fit sequence packing — the TRUNCATION-FREE alternative to
``packing.pack_assignments``: every document lands whole inside one
``seq_len`` bin (no straddling, no mid-document cut), at the cost of
some fill. Ding et al. 2024 ("Fewer Truncations Improve Language
Modeling") show the quality win comes from eliminating truncations;
``packing.py``'s header documents why concat-then-chunk remains the
default when fill is all that matters.

Scale design (the part a naive BFD gets wrong)
----------------------------------------------
Best-fit-decreasing is inherently sequential, so the corpus is sharded
into content-derived GROUPS first (md5 of the id — the same hash-order
trick packing/IVF/diversity use): ~``group_docs`` documents per group,
each group packed independently by an in-batch deterministic BFD
(sorted by (n_tok desc, md5 asc); best bin via bisect on the sorted
fill list — O(n·log n + n·B) per group, B = bins so far). One count
action to size the group space, ONE hash shuffle of (id, n_tok) pairs
— token arrays never move — then applyInPandas, one Arrow batch per
group. Output is bit-identical under any input partitioning: group
membership and in-group order are pure functions of the ids.

Fill quality: BFD inside a 4096-doc group is near-global (bin-packing
waste concentrates in the last few bins of each group); measure with
:func:`packing_stats` before committing to a layout.

Oversize/NULL documents (n_tok > seq_len or NULL) cannot be packed
whole — they come back with ``pack_id = NULL`` for the caller to
pre-chunk (``packing.pack_assignments`` semantics) or drop.
"""

from __future__ import annotations

from bisect import bisect_right

import pandas as pd

from pyspark.sql import DataFrame, functions as F

_HEX = 12  # 48-bit md5 lane for group assignment / in-group order


def best_fit_pack(
    df: DataFrame,
    seq_len: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    group_docs: int = 4096,
    seed: int = 0,
) -> DataFrame:
    """Assign each document to a best-fit bin of capacity ``seq_len``.

    Returns (id_col, n_tok, group_id, pack_id, pack_seq): ``pack_id``
    is the globally-unique bin (``"<group>#<bin>"``), ``pack_seq`` the
    document's position inside its bin (concat order). Oversize/NULL
    rows have NULL pack_id. ``seed`` varies the group hash (distinct
    packings for repeated epochs)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if group_docs <= 0:
        raise ValueError(f"group_docs must be positive, got {group_docs}")
    n_docs = df.count()
    n_groups = max(1, -(-n_docs // group_docs))
    key = F.md5(F.concat_ws("\x1f", F.lit(str(seed)), F.col(id_col)))
    lane = F.conv(F.substring(key, 1, _HEX), 16, 10).cast("long")
    slim = df.select(
        F.col(id_col),
        F.col(n_tok_col).cast("long").alias("n_tok"),
        (lane % n_groups).cast("int").alias("group_id"),
        key.alias("_ord"),
    )

    out_schema = (
        f"{id_col} string, n_tok long, group_id int, "
        "pack_id string, pack_seq int"
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pdf.drop(columns=["_ord"]).assign(
                pack_id=pd.Series(dtype="object"),
                pack_seq=pd.Series(dtype="Int32"),
            )
        gid = int(pdf["group_id"].iloc[0])
        # deterministic BFD order: length desc, md5 asc
        pdf = pdf.sort_values(
            ["n_tok", "_ord"], ascending=[False, True], na_position="last"
        )
        fills: list = []   # ascending bin fills
        binids: list = []  # aligned bin indices
        seqs: dict = {}    # bin -> next pack_seq
        n_bins = 0
        pack_ids, pack_seqs = [], []
        for L in pdf["n_tok"]:
            if pd.isna(L) or L > seq_len or L <= 0:
                pack_ids.append(None)
                pack_seqs.append(None)
                continue
            L = int(L)
            idx = bisect_right(fills, seq_len - L) - 1
            if idx >= 0:
                b = binids.pop(idx)
                new_fill = fills.pop(idx) + L
            else:
                b = n_bins
                n_bins += 1
                new_fill = L
            pos = bisect_right(fills, new_fill)
            fills.insert(pos, new_fill)
            binids.insert(pos, b)
            s = seqs.get(b, 0)
            seqs[b] = s + 1
            pack_ids.append(f"{gid}#{b}")
            pack_seqs.append(s)
        res = pdf.drop(columns=["_ord"]).copy()
        res["pack_id"] = pack_ids
        res["pack_seq"] = pd.array(pack_seqs, dtype="Int32")
        return res

    return slim.groupBy("group_id").applyInPandas(pack_group, out_schema)


def chunk_oversize(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Pre-chunk documents longer than ``seq_len`` into whole-bin
    pieces so :func:`best_fit_pack` can place everything: each oversize
    doc becomes ceil(n/seq_len) rows with ids ``"<id>~<chunk>"``;
    docs that already fit pass through with chunk 0 and their original
    id. Pure expressions (posexplode over a chunk-index sequence +
    ``slice``) — map-only except the Generate, no shuffle, no UDF.

    CONTRACT (ADVICE r5): original ids must not contain ``"~"`` — an
    input id that literally looks like ``"<other>~<k>"`` could collide
    with a generated chunk id and corrupt the downstream equi-join in
    :func:`assemble_packs`. Callers with free-form string ids should
    pre-hash or escape them; ``(parent_id, chunk_index)`` is always
    collision-free and is carried on every output row."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    toks = F.col(tokens_col)
    # the token array is the truth; NULL arrays chunk as empty
    n = F.when(toks.isNull(), F.lit(0)).otherwise(F.size(toks))
    n_chunks = F.greatest(F.ceil(n / F.lit(seq_len)).cast("int"), F.lit(1))
    others = [c for c in df.columns if c not in (id_col, tokens_col, n_tok_col)]
    ex = df.select(
        F.col(id_col).alias("_oid"),
        toks.alias("_t"),
        n.alias("_n"),
        *[F.col(c) for c in others],
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_ci", "_c"),
    ).drop("_c")
    piece = F.slice(F.col("_t"), F.col("_ci") * seq_len + 1, seq_len)
    return ex.select(
        F.when(
            F.col("_n") <= seq_len, F.col("_oid")
        ).otherwise(
            F.concat_ws("~", F.col("_oid"), F.col("_ci").cast("string"))
        ).alias(id_col),
        F.col("_oid").alias("parent_id"),
        F.col("_ci").alias("chunk_index"),
        piece.alias(tokens_col),
        F.when(piece.isNull(), F.lit(0))
        .otherwise(F.size(piece))
        .alias(n_tok_col),
        *[F.col(c) for c in others],
    )


def assemble_packs(
    tokens_df: DataFrame,
    assignments: DataFrame,
    seq_len: int,
    pad_id: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the trainer-facing packed sequences: join the token
    arrays onto the (already-oversize-free) assignments, concatenate
    each bin's documents in ``pack_seq`` order, pad to ``seq_len``.

    Output: (pack_id, tokens [length seq_len], n_real, doc_starts,
    doc_ids) — ``doc_starts`` are the 0-based offsets where each
    document begins (what an attention mask uses to stop cross-doc
    attention; Ding et al.'s point), aligned with ``doc_ids``.

    One equi-join on the id + ONE hash shuffle on pack_id; the
    concat/pad/offsets are pure expressions (aggregate over the
    collected struct list — each bin holds ≤ seq_len tokens by
    construction, so collect_list state is bounded)."""
    a = assignments.where(F.col("pack_id").isNotNull()).select(
        F.col(id_col).alias("_aid"), "pack_id", "pack_seq"
    )
    t = tokens_df.select(F.col(id_col).alias("_tid"), F.col(tokens_col))
    j = a.join(t, a["_aid"] == t["_tid"]).select(
        "pack_id", "pack_seq", F.col("_aid"), F.col(tokens_col)
    )
    packed = j.groupBy("pack_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("pack_seq"), F.col("_aid").alias("did"),
                    F.col(tokens_col).alias("t"),
                )
            )
        ).alias("parts")
    )
    flat = F.flatten(F.transform(F.col("parts"), lambda p: p["t"]))
    n_real = F.size(flat)
    pad = F.transform(
        F.sequence(F.lit(1), F.lit(seq_len) - n_real),
        lambda i: F.lit(pad_id).cast("int"),
    )
    lens = F.transform(F.col("parts"), lambda p: F.size(p["t"]))
    # exclusive running starts: aggregate carries (offsets, running)
    starts = F.aggregate(
        lens,
        F.struct(
            F.array().cast("array<int>").alias("offs"),
            F.lit(0).cast("int").alias("run"),
        ),
        lambda acc, x: F.struct(
            F.concat(acc["offs"], F.array(acc["run"])).alias("offs"),
            (acc["run"] + x).alias("run"),
        ),
        lambda acc: acc["offs"],
    )
    return packed.select(
        "pack_id",
        F.when(n_real < seq_len, F.concat(flat, pad))
        .otherwise(flat)
        .alias(tokens_col),
        n_real.alias("n_real"),
        starts.alias("doc_starts"),
        F.transform(F.col("parts"), lambda p: p["did"]).alias("doc_ids"),
    )


def packing_stats(
    assignments: DataFrame, seq_len: int
) -> DataFrame:
    """One-row audit of a packing: (n_docs, n_oversize, n_packs,
    total_tokens, mean_fill_frac, waste_frac). Two bounded aggregates
    (per-pack fills, then the scalar roll-up)."""
    packed = assignments.where(F.col("pack_id").isNotNull())
    fills = packed.groupBy("pack_id").agg(F.sum("n_tok").alias("fill"))
    per_pack = fills.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("fill").alias("total_tokens"),
        F.round(F.avg(F.col("fill") / F.lit(float(seq_len))), 6).alias(
            "mean_fill_frac"
        ),
    )
    totals = assignments.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("pack_id").isNull().cast("bigint")).alias("n_oversize"),
    )
    return totals.crossJoin(F.broadcast(per_pack)).select(
        "n_docs",
        "n_oversize",
        "n_packs",
        "total_tokens",
        "mean_fill_frac",
        F.round(
            F.lit(1.0)
            - F.col("total_tokens")
            / (F.col("n_packs") * F.lit(float(seq_len))),
            6,
        ).alias("waste_frac"),
    )
