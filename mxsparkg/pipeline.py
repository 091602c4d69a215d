"""Lifecycle C — the full staged pipeline with checkpoint-resume + metrics
(SURVEY.md §3.4). Each stage is a pure DataFrame→DataFrame function;
Checkpointer skips completed stages on restart (manifest = commit point).

Stage DAG:
  extract → detect → (mentions | raw_triples)
  mentions  → link → linked_mentions
  raw_triples → link_triples → triples_linked
  alias clusters → sameas → G1 connected components → canon_map
  triples_linked × canon_map → canonical triples → edges
  linked_mentions × canon_map → nodes
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mxsparkg import graph as G
from mxsparkg import link as L
from mxsparkg.catalog import Checkpointer, read_table
from mxsparkg.detect import broadcast_model, detect, split_detections
from mxsparkg.extract import extract_pages
from mxsparkg.metrics import append_metrics
from mxsparkg.skew import repartition_salted


def run_pipeline(
    spark: SparkSession,
    pages_path: str,
    entity_dict_path: str,
    alias_clusters_path: str,
    checkpoint_root: str,
    rules: list[dict] | None = None,
    pred_patterns: list[dict] | None = None,
    n_partitions: int | None = None,
    with_metrics: bool = True,
) -> dict[str, DataFrame]:
    ck = Checkpointer(spark, checkpoint_root)
    model_bc = broadcast_model(spark, rules, pred_patterns)
    npart = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    def timed(stage: str, fn, *inputs: DataFrame) -> DataFrame:
        t0 = time.time()
        done_before = ck.is_done(stage)
        out = ck.run_stage(stage, fn, *inputs)
        if with_metrics and not done_before:
            append_metrics(spark, checkpoint_root, out, stage,
                           (time.time() - t0) * 1000.0)
        return out

    pages = read_table(spark, pages_path)

    # 1. extract (U1) — salted repartition by host first: Zipf-hot hosts
    #    otherwise serialize the detect stage behind a few fat partitions
    def s_extract(p: DataFrame) -> DataFrame:
        clean = extract_pages(p)
        return repartition_salted(clean, "host", npart, salt_on=["url"])

    pages_clean = timed("extract", s_extract, pages)

    # 2. detect (U3) — fused tokenize+trie+pairing, one Arrow pass
    detections = timed("detect", lambda d: detect(d, model_bc), pages_clean)
    mentions, raw_triples = split_detections(detections)

    # 3. link (J1/W1/J3)
    edict = read_table(spark, entity_dict_path)
    linked = timed("link_mentions", lambda m: L.link_mentions(m, edict), mentions)
    triples_linked = timed(
        "link_triples", lambda t: L.link_triples(t, edict), raw_triples
    )

    # 4. canonicalize (G1) — CC over same-as chains
    aliases = read_table(spark, alias_clusters_path)

    def s_canon(_: DataFrame) -> DataFrame:
        return G.connected_components(G.sameas_edges(aliases))

    canon_map = timed("canon_map", s_canon, aliases)

    # 5. rewrite + materialize graph
    triples = timed(
        "triples", lambda t: G.rewrite_canonical(t, canon_map), triples_linked
    )
    edges = timed("edges", G.materialize_edges, triples)
    nodes = timed(
        "nodes", lambda m: G.materialize_nodes(m, canon_map), linked
    )

    return {
        "pages_clean": pages_clean,
        "detections": detections,
        "mentions": mentions,
        "linked_mentions": linked,
        "triples": triples,
        "canon_map": canon_map,
        "edges": edges,
        "nodes": nodes,
    }


def triples_for_eval(triples: DataFrame) -> DataFrame:
    """Distinct (subj, pred, obj, url) — the P/R comparison unit."""
    return triples.select("subj", "pred", "obj", "url").distinct()
