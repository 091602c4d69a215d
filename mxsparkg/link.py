"""Entity linking: broadcast dictionary join + best-candidate selection +
NIL handling (SURVEY.md §2.3 J1/J3, §2.5 W1, §2.9 U4).

Semantics mirror reference_impl.tagger.link_surface exactly: best candidate
= max over (prior, entity_id); unknown surface → deterministic NIL id
"nil:" + sha256(surface_norm)[:16].

Scale notes: the entity dictionary is reduced to best-per-surface FIRST
(one small agg), then broadcast — a 1:1 broadcast-hash join against the
mention stream, no shuffle of the big side. If the dictionary outgrows the
broadcast threshold, drop the hint and Spark falls back to sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def best_candidates(entity_dict: DataFrame) -> DataFrame:
    """surface_norm → single best (entity_id, prior): max by (prior, id)."""
    return entity_dict.groupBy("surface_norm").agg(
        F.max_by("entity_id", F.struct("prior", "entity_id")).alias("entity_id"),
        F.max(F.struct("prior", "entity_id")).getField("prior").alias("prior"),
    )


def nil_id(col):
    return F.concat(F.lit("nil:"), F.substring(F.sha2(col.cast("binary"), 256), 1, 16))


_DICT_STATS_CACHE: dict[str, dict] = {}


def _dict_cache_key(entity_dict: DataFrame) -> str:
    """Content-derived cache key: Catalyst semanticHash of the analyzed
    plan (+ schema). Unlike id(), this can't be silently reused for a
    *different* dictionary after GC — two dictionaries share a key only if
    they are semantically the same relational expression (semanticHash
    canonicalizes expression ids but hashes LocalRelation data), in which
    case the cached stats are valid. Plan *strings* would not work here:
    fresh expression ids make every createDataFrame plan string unique, so
    the cache would never hit across rebuilt-but-identical dictionaries."""
    try:
        h = entity_dict._jdf.queryExecution().analyzed().semanticHash()
        return f"{h}:{entity_dict.schema.simpleString()}"
    except Exception:  # non-JVM backends (Spark Connect): no caching
        return f"id:{id(entity_dict)}:{entity_dict.schema.simpleString()}"


def dict_stats(entity_dict: DataFrame) -> dict:
    """One tiny driver action on the dimension-side dictionary: max
    candidates per surface and max context_words size. Drives two adaptive
    plan choices (link fast path; context emission in detect). Cached per
    analyzed-plan string so the pipeline pays it once per distinct
    dictionary expression."""
    key = _dict_cache_key(entity_dict)
    if key not in _DICT_STATS_CACHE:
        row = (
            entity_dict.groupBy("surface_norm")
            .agg(
                F.count("*").alias("n"),
                F.max(
                    F.coalesce(F.size("context_words"), F.lit(0))
                ).alias("cw"),
            )
            .agg(F.max("n").alias("max_cands"), F.max("cw").alias("max_cw"))
            .first()
        )
        _DICT_STATS_CACHE[key] = {
            "max_cands": row["max_cands"],
            "max_cw": row["max_cw"],
        }
    return _DICT_STATS_CACHE[key]


def link_mentions(
    mentions: DataFrame,
    entity_dict: DataFrame,
    context_weight: float = 1.0,
) -> DataFrame:
    """mentions(+surface_norm, context) → linked mentions with entity_id,
    link_score, nil flag (J1 broadcast join + U4 context scoring + W1
    best-candidate window + J3 NIL handling).

    score = prior + context_weight × |ctx ∩ context_words| / |context_words|
    Ambiguous surfaces (several dictionary candidates) are resolved by the
    context overlap; with no context_words the score reduces to the prior
    and the tie-break (score desc, entity_id desc) matches
    reference_impl.tagger.link_surface exactly.

    Scale: candidates stay a broadcast join (dictionary ≪ mentions); the W1
    window partitions by mention key, so no global sort."""
    from pyspark.sql.window import Window

    has_ctx = "context" in mentions.columns
    # adaptive plan: when no surface has >1 candidate, the W1 window is a
    # no-op over the whole mention stream — skip the 10^10-row shuffle and
    # broadcast-join the best-per-surface table directly. One tiny driver
    # action on the (small, dimension-side) dictionary decides.
    stats = dict_stats(entity_dict)
    if stats["max_cands"] is None or (
        stats["max_cands"] <= 1 and stats["max_cw"] <= 0
    ):
        best = best_candidates(entity_dict)
        joined = mentions.join(F.broadcast(best), on="surface_norm", how="left")
        return joined.select(
            *mentions.columns,
            F.coalesce(
                F.col("entity_id"), nil_id(F.col("surface_norm"))
            ).alias("entity_id"),
            F.coalesce(F.col("prior"), F.lit(0.0)).alias("link_score"),
            F.col("entity_id").isNull().alias("nil"),
        )

    cand = entity_dict.select("surface_norm", "entity_id", "prior",
                              "context_words")
    joined = mentions.join(F.broadcast(cand), on="surface_norm", how="left")
    if has_ctx:
        overlap = F.size(
            F.array_intersect(
                F.split(F.coalesce(F.col("context"), F.lit("")), " "),
                F.coalesce(
                    F.col("context_words"),
                    F.array().cast("array<string>"),
                ),
            )
        )
        ctx_score = overlap / F.greatest(
            F.size(
                F.coalesce(
                    F.col("context_words"), F.array().cast("array<string>")
                )
            ),
            F.lit(1),
        )
    else:
        ctx_score = F.lit(0.0)
    scored = joined.withColumn(
        "_score",
        F.coalesce(F.col("prior"), F.lit(0.0))
        + F.lit(context_weight) * ctx_score,
    )
    w = Window.partitionBy("url", "sent_id", "m_start").orderBy(
        F.desc("_score"), F.desc("entity_id")
    )
    best = scored.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") == 1
    )
    return best.select(
        *mentions.columns,
        F.coalesce(F.col("entity_id"), nil_id(F.col("surface_norm"))).alias("entity_id"),
        F.when(F.col("entity_id").isNull(), F.lit(0.0))
        .otherwise(F.col("_score")).alias("link_score"),
        F.col("entity_id").isNull().alias("nil"),
    )


def link_triples(raw_triples: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """raw triples carry normalized surfaces in subj/obj → entity ids."""
    best = best_candidates(entity_dict)
    s = best.select(
        F.col("surface_norm").alias("subj"), F.col("entity_id").alias("subj_eid")
    )
    o = best.select(
        F.col("surface_norm").alias("obj"), F.col("entity_id").alias("obj_eid")
    )
    out = (
        raw_triples.join(F.broadcast(s), on="subj", how="left")
        .join(F.broadcast(o), on="obj", how="left")
    )
    return out.select(
        F.coalesce("subj_eid", nil_id(F.col("subj"))).alias("subj"),
        "pred",
        F.coalesce("obj_eid", nil_id(F.col("obj"))).alias("obj"),
        "url",
        "sent_id",
        "conf",
    )
