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


def link_mentions(mentions: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """mentions(+surface_norm) → linked mentions with entity_id, link_score,
    nil flag. Left join keeps unlinkable mentions (J3)."""
    best = best_candidates(entity_dict)
    joined = mentions.join(F.broadcast(best), on="surface_norm", how="left")
    return joined.select(
        *mentions.columns,
        F.coalesce(F.col("entity_id"), nil_id(F.col("surface_norm"))).alias("entity_id"),
        F.coalesce(F.col("prior"), F.lit(0.0)).alias("link_score"),
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
