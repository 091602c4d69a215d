"""G1 connected components + G2 canonical rewrite + nodes/edges rollups
(SURVEY.md §2.10). No GraphFrames jar in this sandbox — hand-rolled
alternating large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014) as a pure DataFrame loop.

Scale notes: converges in O(log n) rounds on any graph; each round is two
shuffles (groupBy min + join). `localCheckpoint` per round truncates the
otherwise-exponential lineage. High-degree roots are exactly what
large-star is designed to flatten, so no extra salting is needed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev)


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the min of
    the closed neighborhood."""
    nbrs = _sym(edges).groupBy("src").agg(
        F.collect_set("dst").alias("nbrs")
    )
    m = F.array_min(F.array_union(F.col("nbrs"), F.array(F.col("src"))))
    out = nbrs.select(
        F.col("src").alias("u"),
        m.alias("m"),
        F.filter(F.col("nbrs"), lambda v: v > F.col("src")).alias("bigger"),
    )
    return (
        out.select(F.explode("bigger").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge (max→min); connect all smaller neighbors (and the
    center) to the minimum."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    grouped = oriented.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    m = F.array_min(F.col("nbrs"))
    out = grouped.select(
        F.col("src").alias("center"),
        m.alias("m"),
        F.array_union(F.col("nbrs"), F.array(F.col("src"))).alias("members"),
    )
    return (
        out.select(F.explode("members").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """edges(src, dst) strings → canon_map(entity_id, canon_id).

    canon_id = min node id of the component (deterministic). Singleton nodes
    (no edges) are the caller's concern — rewrite_canonical coalesces.
    """
    cur = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        # converged when the edge set is stable (order-insensitive xor-hash;
        # xor, not sum: ANSI mode would overflow a long sum)
        def _sig(df):
            r = df.select(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
            ).first()
            return (r["n"], r["h"])

        sig_cur, sig_nxt = _sig(cur), _sig(nxt)
        cur = nxt
        if sig_cur == sig_nxt:
            break
    # after convergence every edge is (node, root) with root = component min
    members = cur.select(F.col("src").alias("entity_id"), F.col("dst").alias("canon_id"))
    roots = cur.select(F.col("dst").alias("entity_id")).distinct().withColumn(
        "canon_id", F.col("entity_id")
    )
    return members.unionByName(roots).distinct()


def rewrite_canonical(triples: DataFrame, canon_map: DataFrame) -> DataFrame:
    """G2: subj/obj → canonical ids (two joins; broadcast if map is small)."""
    s = canon_map.select(
        F.col("entity_id").alias("subj"), F.col("canon_id").alias("subj_canon")
    )
    o = canon_map.select(
        F.col("entity_id").alias("obj"), F.col("canon_id").alias("obj_canon")
    )
    return (
        triples.join(F.broadcast(s), on="subj", how="left")
        .join(F.broadcast(o), on="obj", how="left")
        .select(
            F.coalesce("subj_canon", F.col("subj")).alias("subj"),
            "pred",
            F.coalesce("obj_canon", F.col("obj")).alias("obj"),
            "url",
            "sent_id",
            "conf",
        )
    )


def materialize_edges(canon_triples: DataFrame) -> DataFrame:
    """A3: edge rollup with support counts + provenance urls."""
    return canon_triples.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("n_support"),
        F.array_sort(F.collect_set("url")).alias("urls"),
    )


def materialize_nodes(linked_mentions: DataFrame, canon_map: DataFrame) -> DataFrame:
    """A4: node rollup — mention count, surface forms, majority type."""
    cm = canon_map.select(
        F.col("entity_id"), F.col("canon_id")
    )
    withc = linked_mentions.join(F.broadcast(cm), on="entity_id", how="left").select(
        F.coalesce("canon_id", F.col("entity_id")).alias("canon_id"),
        "surface_norm",
        "etype",
    )
    return withc.groupBy("canon_id").agg(
        F.count("*").alias("n_mentions"),
        F.array_sort(F.collect_set("surface_norm")).alias("surface_forms"),
        F.mode("etype").alias("etype"),
    )


def sameas_edges(alias_clusters: DataFrame) -> DataFrame:
    """Alias clusters (entity_id, canon_id — e.g. redirect/alias data shipped
    with the dictionary) → same-as CHAIN edges per cluster. Chains (not
    cliques) on purpose: connected components must do real multi-hop work."""
    g = alias_clusters.groupBy("canon_id").agg(
        F.array_sort(F.collect_set("entity_id")).alias("ids")
    )
    return g.select(
        F.explode(
            F.zip_with(
                F.slice("ids", 1, F.greatest(F.size("ids") - 1, F.lit(0))),
                F.slice("ids", 2, F.greatest(F.size("ids") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
