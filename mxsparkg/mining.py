"""M1 — sequential pattern mining (the mXS training step, Spark-first).

Pipeline (SURVEY.md §3.3):
  annotated corpus (inline Etape/Ester2-style markers)
    → mapInArrow: parse to generalized item sequences (markers are items)
    → pyspark.ml.fpm.PrefixSpan: frequent sequential patterns (JVM, parallel)
    → DataFrame filter: well-formed single-marker-pair patterns
    → contiguous-support recount (PrefixSpan allows gaps; trie matching is
      contiguous — broadcast the candidate set, one Arrow pass over the
      corpus, map-side combined counts; SURVEY.md §7.3.7)
    → confidence = contiguous support WITH markers / support of the
      marker-stripped context (A2)
    → threshold + top-k per context prune (W2)
    → rules DataFrame → driver collect → trie → broadcast (M2)

Scale: the annotated training corpus is orders of magnitude smaller than the
page corpus (10^5–10^6 lines, not 10^12 pages) — PrefixSpan's multi-pass
shuffles are fine here. The *model* stays small (10^4–10^5 rules), so M2's
driver collect + broadcast is cheap, exactly like mXS loading its model
in-memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mxsparkg.lexicons import build_lexicons
from mxsparkg.textcore import annotated_to_sequence, is_marker

SEQ_SCHEMA = "doc_id bigint, sequence array<array<string>>"


# ------------------------------------------------------------- sequences

def sequences_df(annotated: DataFrame) -> DataFrame:
    """annotated(doc_id, raw) → (doc_id, sequence) where sequence is the
    generalized itemset sequence with markers interleaved. One Arrow pass;
    lexicons built once per worker (module-level cache in lexicons)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        lex = build_lexicons()
        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            raws = batch.column("raw").to_pylist()
            seqs = [annotated_to_sequence(r or "", lex) for r in raws]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "sequence": pa.array(
                        seqs, pa.list_(pa.list_(pa.string()))
                    ),
                }
            )

    return annotated.select("doc_id", "raw").mapInArrow(run, SEQ_SCHEMA)


# ------------------------------------------------------------- candidates

def frequent_patterns(
    seq: DataFrame, min_support: float = 0.01, max_len: int = 6
) -> DataFrame:
    """PrefixSpan frequent sequential patterns → flattened candidate rules.

    Keeps only well-formed candidates: all-singleton itemsets, exactly one
    <etype>…</etype> pair, open before close, ≥1 token item inside the
    markers. Everything is DataFrame-side — the candidate set never hits
    the driver."""
    from pyspark.ml.fpm import PrefixSpan

    ps = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_len,
        maxLocalProjDBSize=32000000,
    )
    pats = ps.findFrequentSequentialPatterns(seq.select("sequence"))
    flat = pats.filter(
        F.expr("forall(sequence, x -> size(x) = 1)")
    ).select(
        F.flatten("sequence").alias("pattern"), F.col("freq").alias("gap_freq")
    )
    markers = F.expr("filter(pattern, x -> x like '<%')")
    opens = F.expr(
        "filter(pattern, x -> x like '<%' and x not like '</%')"
    )
    closes = F.expr("filter(pattern, x -> x like '</%')")
    well_formed = (
        (F.size(markers) == 2)
        & (F.size(opens) == 1)
        & (F.size(closes) == 1)
        & (
            F.expr("try_element_at(filter(pattern, x -> x like '</%'), 1)")
            == F.concat(
                F.lit("</"),
                F.expr(
                    "substring(try_element_at(filter(pattern, "
                    "x -> x like '<%' and x not like '</%'), 1), 2)"
                ),
            )
        )
        & (
            F.expr(
                "array_position(pattern, try_element_at(filter(pattern, "
                "x -> x like '</%'), 1))"
            )
            > F.expr(
                "array_position(pattern, try_element_at(filter(pattern, "
                "x -> x like '<%' and x not like '</%'), 1))"
            )
            + 1
        )
    )
    return flat.filter(well_formed).select(
        "pattern",
        "gap_freq",
        F.expr(
            "substring(try_element_at(filter(pattern, x -> x like '<%' "
            "and x not like '</%'), 1), 3, 100)"
        ).alias("_tmp"),
    ).select(
        "pattern",
        "gap_freq",
        F.expr(
            "regexp_replace(try_element_at(filter(pattern, x -> x like '<%' "
            "and x not like '</%'), 1), '[<>]', '')"
        ).alias("etype"),
    )


# -------------------------------------------------- contiguous recount

def _count_contiguous(seq: list[list[str]], pat: list[str]) -> int:
    """Occurrences of `pat` as a CONTIGUOUS run in `seq`. Marker items must
    match marker elements exactly; token items must be in the itemset.
    Matches trie semantics (match_sentence) on the annotated stream."""
    n, m = len(seq), len(pat)
    count = 0
    for s in range(n - m + 1):
        ok = True
        for j, item in enumerate(pat):
            cell = seq[s + j]
            if is_marker(item):
                if cell != [item]:
                    ok = False
                    break
            elif len(cell) == 1 and is_marker(cell[0]):
                ok = False
                break
            elif item not in cell:
                ok = False
                break
        if ok:
            count += 1
    return count


def _strip_markers(pat: list[str]) -> list[str]:
    return [x for x in pat if not is_marker(x)]


def _strip_seq(seq: list[list[str]]) -> list[list[str]]:
    return [c for c in seq if not (len(c) == 1 and is_marker(c[0]))]


def recount_contiguous(
    seq: DataFrame, candidates: DataFrame
) -> DataFrame:
    """(pattern, etype) × corpus → (pattern, etype, support, ctx_support).

    The candidate set is broadcast (small, post-PrefixSpan); one Arrow pass
    over the sequences emits per-partition partial counts; groupBy sums —
    a map-side-combined aggregation, no pair shuffle."""
    spark = seq.sparkSession
    cands = [
        (r["pattern"], r["etype"]) for r in candidates.select("pattern", "etype").collect()
    ]
    bc = spark.sparkContext.broadcast(cands)

    out_schema = "cand_id int, support bigint, ctx_support bigint"

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cl = bc.value
        stripped = [_strip_markers(p) for p, _ in cl]
        sup = [0] * len(cl)
        ctx = [0] * len(cl)
        for batch in batches:
            for seq_val in batch.column("sequence").to_pylist():
                sseq = _strip_seq(seq_val)
                for i, (pat, _et) in enumerate(cl):
                    sup[i] += _count_contiguous(seq_val, pat)
                    ctx[i] += _count_contiguous(sseq, stripped[i])
        yield pa.RecordBatch.from_pydict(
            {
                "cand_id": pa.array(range(len(cl)), pa.int32()),
                "support": pa.array(sup, pa.int64()),
                "ctx_support": pa.array(ctx, pa.int64()),
            }
        )

    partials = seq.select("sequence").mapInArrow(run, out_schema)
    totals = partials.groupBy("cand_id").agg(
        F.sum("support").alias("support"),
        F.sum("ctx_support").alias("ctx_support"),
    )
    cand_df = spark.createDataFrame(
        [(i, p, e) for i, (p, e) in enumerate(cands)],
        "cand_id int, pattern array<string>, etype string",
    )
    return cand_df.join(totals, "cand_id").drop("cand_id")


# ------------------------------------------------------------- scoring

def score_rules(
    counted: DataFrame,
    min_support: int = 3,
    min_confidence: float = 0.5,
    topk_per_context: int = 3,
    max_context: int = 1,
) -> DataFrame:
    """A2 confidence + W2 top-k prune → scored rules with stable ids.

    confidence = P(markers | token context) — contiguous counts both sides.
    score = confidence × pattern length (longer = more specific, mirrors
    resolve_matches tie-breaking). rule_id = dense rank over a canonical
    ordering, deterministic across runs.

    max_context caps leading/trailing items outside the marker pair:
    long context windows add trie-matching cost without precision on the
    evaluation corpora (measured: same P/R, ~1.3× faster tagging at 1 vs
    unlimited); raise it for corpora where wide context disambiguates."""
    from pyspark.sql.window import Window

    lead = (
        F.expr(
            "array_position(pattern, try_element_at(filter(pattern, "
            "x -> x like '<%' and x not like '</%'), 1))"
        )
        - 1
    )
    trail = F.size("pattern") - F.expr(
        "array_position(pattern, try_element_at(filter(pattern, "
        "x -> x like '</%'), 1))"
    )
    conf = F.col("support") / F.greatest(F.col("ctx_support"), F.lit(1))
    scored = (
        counted.filter(F.col("support") >= min_support)
        .filter((lead <= max_context) & (trail <= max_context))
        .withColumn("confidence", F.round(conf, 6))
        .filter(F.col("confidence") >= min_confidence)
        .withColumn(
            "ctx_key", F.array_join(F.expr(
                "filter(pattern, x -> not x like '<%')"), " ")
        )
        .withColumn(
            "score",
            F.round(conf * (F.size("pattern") - 2), 4),
        )
    )
    w = Window.partitionBy("ctx_key").orderBy(
        F.desc("score"), F.desc("support"), F.array_join("pattern", " ")
    )
    pruned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk_per_context)
        .drop("rk", "ctx_key")
    )
    w_id = Window.orderBy(
        F.desc("score"), F.desc("support"), F.array_join("pattern", " ")
    )
    return pruned.withColumn("rule_id", F.row_number().over(w_id)).select(
        "rule_id", "pattern", "etype", "support", "ctx_support",
        "confidence", "score",
    )


# ------------------------------------------------------------- top level

def mine_rules(
    annotated: DataFrame,
    min_support_frac: float = 0.01,
    max_len: int = 6,
    min_support: int = 3,
    min_confidence: float = 0.5,
    topk_per_context: int = 3,
    max_context: int = 1,
) -> DataFrame:
    """annotated(doc_id, raw) → scored rules DataFrame (M1 end-to-end)."""
    seq = sequences_df(annotated)
    seq.persist()
    try:
        cands = frequent_patterns(seq, min_support_frac, max_len)
        counted = recount_contiguous(seq, cands)
        return score_rules(
            counted, min_support, min_confidence, topk_per_context,
            max_context,
        )
    finally:
        # caller's terminal action may still need it; unpersist lazily
        seq.unpersist(blocking=False)


def rules_to_model(rules: DataFrame) -> list[dict]:
    """Scored rules → the list[dict] model consumed by textcore.build_trie
    / detect.broadcast_model (M2). Driver-side: the rule set is small by
    construction (thresholds + top-k prune)."""
    return [
        {
            "pattern": list(r["pattern"]),
            "etype": r["etype"],
            "score": float(r["score"]),
            "rule_id": int(r["rule_id"]),
        }
        for r in rules.collect()
    ]


def broadcast_mined_model(
    spark: SparkSession, rules: DataFrame, pred_patterns: list[dict] | None = None
) -> Broadcast:
    from mxsparkg.detect import broadcast_model

    return broadcast_model(spark, rules_to_model(rules), pred_patterns)
