"""G1 connected components + G2 canonical rewrite + nodes/edges rollups
(SURVEY.md §2.10). No GraphFrames jar in this sandbox — hand-rolled
alternating large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014) as a pure DataFrame loop.

Scale notes: converges in O(log n) rounds on any graph; each round is two
shuffles (groupBy min + join). `localCheckpoint` per round truncates the
otherwise-exponential lineage. High-degree roots are exactly what
large-star is designed to flatten — and both star steps are formulated
RELATIONALLY (per-node min via map-side-combinable groupBy + an equi-join
of the edge list against that min table), never as per-node adjacency
arrays: a collect_set/explode formulation buffers a celebrity hub's whole
neighborhood (10^6-10^8 edges at web scale) on one reducer, while the
min+join shape streams it — the hub key's rows flow through a sort-merge
join task without materializing, and AQE's skew-join split applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev)


def _min_join(probe: DataFrame, mins: DataFrame, join_salts: int) -> DataFrame:
    """The star steps' edge⋈per-node-min equi-join on src. join_salts=0
    (default): plain shuffle-hash (build side is one row per node, bounded
    per partition; skipping the probe-side sort saves two O(E log E) sorts
    per round × O(log n) rounds). join_salts=S: explicit salted join
    (skew.salted_join — probe salted by row hash, min table replicated ×S)
    for hubs hot enough that one probe partition dominates the round wall
    but still below AQE's skew-split byte thresholds — see the measured
    comparison in BENCH/CC.md."""
    if join_salts:
        from mxsparkg.skew import salted_join

        return salted_join(probe, mins, on="src", n_salts=join_salts)
    return probe.join(mins.hint("shuffle_hash"), "src")


def _large_star(edges: DataFrame, join_salts: int = 0) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the min of
    u's closed neighborhood.

    Relational (skew-safe) form: m(u) = least(u, min over neighbors) is a
    map-side-combinable min agg — a 10^7-degree hub reduces to partial
    minima on the map side, nothing buffers. The emit step joins the
    symmetric edge list back against the one-row-per-node m table on u, so
    the hub's rows STREAM through the join instead of materializing as one
    collect_set array (the OOM shape this repo measured on rollup windows)."""
    sym = _sym(edges)
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.col("src")).alias("m")
    )
    return (
        _min_join(sym.filter(F.col("dst") > F.col("src")), mins, join_salts)
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame, join_salts: int = 0) -> DataFrame:
    """Orient each edge (max→min); connect all smaller neighbors (and the
    center) to the minimum. Same relational min+join shape as _large_star
    (min over oriented out-neighbors is ≤ center, so no least() needed on
    the emit side; the center→m self edge rides in via a union of the tiny
    per-node min table)."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    nbr_edges = _min_join(oriented, mins, join_salts).select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    center_edges = mins.select("src", F.col("m").alias("dst"))
    return (
        nbr_edges.unionByName(center_edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _driver_cc(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Union-find on the driver (path-halving); canon = component min."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return sorted((x, find(x)) for x in parent)


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    driver_threshold: int = 200_000,
    reliable_checkpoint_dir: str | None = None,
    stats: dict | None = None,
    join_salts: int = 0,
) -> DataFrame:
    """edges(src, dst) strings → canon_map(entity_id, canon_id).

    canon_id = min node id of the component (deterministic). Singleton nodes
    (no edges) are the caller's concern — rewrite_canonical coalesces.

    Hybrid strategy (the CC analogue of a broadcast-join threshold): the
    same-as graph is usually orders of magnitude smaller than the corpus, so
    below `driver_threshold` edges one collect + union-find beats an O(log n)
    round-trip loop of shuffles (driver_threshold is a DRIVER-MEMORY bound:
    ~100 bytes/edge ⇒ the default keeps the collect ≲ 20 MB; size it to the
    driver, not the cluster); above it, the distributed alternating
    large-/small-star loop (Kiveris et al.) runs with per-round checkpoints
    to truncate lineage. Both paths produce identical maps (property-tested
    in tests/test_graph.py).

    reliable_checkpoint_dir: per-round truncation uses localCheckpoint()
    (executor-local, fastest) by default — fine at local[N], but a long CC
    run on a real cluster loses rounds on executor death. Pass a
    durable-storage dir to switch to reliable checkpoint() (survives
    executor loss at the cost of one write per round).

    stats: optional dict the call fills with {'path': 'driver'|'distributed',
    'rounds': k} — observability for bench/ops, no behavior change.

    join_salts: 0 (default) = plain shuffle-hash star joins; N = route the
    star steps' edge⋈min joins through skew.salted_join with N salts, for
    hub partitions hot enough to bound the round wall yet below AQE's
    skew-split byte thresholds (measured comparison in BENCH/CC.md;
    results are identical either way — salt-equality property-tested)."""
    spark = edges.sparkSession
    if reliable_checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(reliable_checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint()
    else:
        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()
    cur = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    cur.persist()
    try:
        n_edges = cur.limit(driver_threshold + 1).count()
        if n_edges <= driver_threshold:
            if stats is not None:
                stats.update(path="driver", rounds=0)
            pairs = [(r["src"], r["dst"]) for r in cur.collect()]
            out = _driver_cc(pairs)
            if not out:
                return spark.createDataFrame(
                    [], "entity_id string, canon_id string"
                )
            return spark.createDataFrame(
                out, "entity_id string, canon_id string"
            )
    finally:
        cur.unpersist(blocking=False)

    cur = _ckpt(cur)

    def _sig(df):
        # order-insensitive xor-hash (xor, not sum: ANSI would overflow)
        r = df.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    sig_cur = _sig(cur)
    rounds = 0
    for _ in range(max_iter):
        nxt = _ckpt(_small_star(_large_star(cur, join_salts), join_salts))
        sig_nxt = _sig(nxt)
        cur = nxt
        rounds += 1
        if sig_cur == sig_nxt:
            break
        sig_cur = sig_nxt
    if stats is not None:
        stats.update(path="distributed", rounds=rounds)
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


def materialize_edges(
    canon_triples: DataFrame, n_salts: int = 8, max_urls: int = 1000
) -> DataFrame:
    """A3: edge rollup with support counts + provenance urls.

    Skew-safe two-phase aggregation (J8 analogue for aggs): a celebrity
    edge at web scale has 10^6+ supporting urls — one reducer building that
    collect_set is the skew bottleneck. Phase 1 groups by (key, salt) so the
    hot key spreads over n_salts reducers; phase 2 merges the partial sets.
    Provenance is capped at the lexicographically-first `max_urls`
    (deterministic), with the true support in n_support."""
    salted = canon_triples.withColumn(
        "_salt", F.pmod(F.xxhash64("url"), F.lit(n_salts))
    )
    partial = salted.groupBy("subj", "pred", "obj", "_salt").agg(
        F.count("*").alias("_n"),
        F.slice(F.array_sort(F.collect_set("url")), 1, max_urls).alias("_urls"),
    )
    return partial.groupBy("subj", "pred", "obj").agg(
        F.sum("_n").alias("n_support"),
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_urls")))),
            1,
            max_urls,
        ).alias("urls"),
    )


def materialize_nodes(
    linked_mentions: DataFrame,
    canon_map: DataFrame,
    n_salts: int = 8,
    max_surfaces: int = 1000,
) -> DataFrame:
    """A4: node rollup — mention count, surface forms, majority type.

    Same two-phase salted aggregation as materialize_edges: a celebrity
    entity's mentions would otherwise funnel into one reducer. Majority
    type folds through (canon_id, etype) counts, so it is exact (not a
    mode over a sample) and never builds a per-entity row set."""
    cm = canon_map.select(
        F.col("entity_id"), F.col("canon_id")
    )
    withc = linked_mentions.join(F.broadcast(cm), on="entity_id", how="left").select(
        F.coalesce("canon_id", F.col("entity_id")).alias("canon_id"),
        "surface_norm",
        "etype",
        F.pmod(F.xxhash64("url", "m_start"), F.lit(n_salts)).alias("_salt"),
    )
    partial = withc.groupBy("canon_id", "etype", "_salt").agg(
        F.count("*").alias("_n"),
        F.slice(
            F.array_sort(F.collect_set("surface_norm")), 1, max_surfaces
        ).alias("_surf"),
    )
    by_type = partial.groupBy("canon_id", "etype").agg(
        F.sum("_n").alias("_n"),
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_surf")))),
            1,
            max_surfaces,
        ).alias("_surf"),
    )
    return by_type.groupBy("canon_id").agg(
        F.sum("_n").alias("n_mentions"),
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_surf")))),
            1,
            max_surfaces,
        ).alias("surface_forms"),
        F.max_by("etype", F.struct(F.col("_n"), F.col("etype"))).alias("etype"),
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
