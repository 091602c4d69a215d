"""Hyperlink-graph extraction — the OTHER graph a web crawl yields.

The KG pipeline materializes the ENTITY graph; every production crawl
pipeline also materializes the HYPERLINK graph from the same pages
(it feeds PageRank-style authority, crawl frontier scheduling, spam
neighborhoods, and the inter-host edges the salience queries join
against). This module extracts it from the same (url, html) frame the
detect stage reads — WARC-sourced or parquet-sourced alike:

  extract_links(pages)  →  (src, dst, anchor)   one row per resolved href
  host_graph(links)     →  (src_host, dst_host, n_links)

Execution shape: ONE mapInPandas Arrow pass over (url, html) — href
scanning and RFC-3986 resolution are stdlib (html.parser + urljoin), no
per-row Python beyond the batch loop, and the fat html column never
shuffles (links are extracted before any exchange, the same narrow-
output discipline as the fused detect stage). The host rollup is a
map-side-combinable groupBy on parse_url(HOST) — JVM-side.

Filtering: only http(s) targets survive (mailto:, javascript:, data:,
fragments-only hrefs are dropped); fragments are stripped from resolved
URLs so the graph keys match url_canon_dedup's canonical space.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINKS_SCHEMA = "src string, dst string, anchor string"


def iter_links(base_url: str, html_text: str):
    """Pure-Python href extraction + resolution for ONE page — the unit
    the tests pin byte-for-byte. html.parser (stdlib, tolerant of broken
    markup — real crawl HTML is broken) yields (resolved_url, anchor
    text) for every <a href>; non-http(s) schemes are dropped and
    fragments stripped."""
    from html.parser import HTMLParser
    from urllib.parse import urldefrag, urljoin

    out: list[tuple[str, str]] = []

    class P(HTMLParser):
        def __init__(self) -> None:
            super().__init__()
            self._href: str | None = None
            self._text: list[str] = []

        def _emit(self) -> None:
            if self._href is None:
                return
            try:
                url = urldefrag(urljoin(base_url, self._href)).url
            except ValueError:
                url = ""
            if url.startswith(("http://", "https://")):
                out.append((url, " ".join("".join(self._text).split())))
            self._href = None

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                # a new <a> implicitly closes an unclosed one — real
                # crawl HTML leaves anchors dangling constantly
                self._emit()
                self._href, self._text = dict(attrs).get("href"), []

        def handle_data(self, data):
            if self._href is not None:
                self._text.append(data)

        def handle_endtag(self, tag):
            if tag == "a":
                self._emit()

    p = P()
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass  # truncated/hostile markup: keep what was parsed
    p._emit()  # EOF with an anchor still open: flush it
    return out


def extract_links(pages: DataFrame) -> DataFrame:
    """(url, html, ...) → (src, dst, anchor): the resolved hyperlink
    edge list, one Arrow pass, html never shuffles."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for url, html in zip(b["url"], b["html"]):
                if html is None:
                    continue
                text = bytes(html).decode("utf-8", "replace")
                rows.extend(
                    (url, dst, anchor)
                    for dst, anchor in iter_links(url, text)
                )
            yield pd.DataFrame(rows, columns=["src", "dst", "anchor"])

    return pages.select("url", "html").mapInPandas(parse, LINKS_SCHEMA)


def anchor_aliases(
    links: DataFrame, min_support: int = 2, top_k_per_dst: int = 5
) -> DataFrame:
    """Anchor-text alias mining — the classic web-scale alias source for
    entity linking (the text people USE to link to a page is what they
    call the thing behind it; Wikipedia anchors bootstrapped half the
    published EL systems): per (dst, normalized anchor), the number of
    DISTINCT source pages using it, kept above min_support and top-k per
    destination by (support desc, alias asc). Feeds the pipeline's alias
    input (the --aliases table G2 canonicalizes with) from the crawl
    itself instead of a hand-curated list.

    Scale shape: normalize + filter in codegen, one map-side-combinable
    distinct-count groupBy on (dst, alias), per-dst top-k as a
    row_number window over the already-aggregated (small) table. Empty/
    whitespace anchors and anchors longer than 80 chars (navigation
    junk) are dropped before the shuffle."""
    from pyspark.sql import Window

    norm = F.trim(F.regexp_replace(F.lower(F.col("anchor")), r"\s+", " "))
    cand = (
        links.select("src", "dst", norm.alias("alias"))
        .filter((F.length("alias") > 0) & (F.length("alias") <= 80))
        .groupBy("dst", "alias")
        .agg(F.count_distinct("src").alias("n_sources"))
        .filter(F.col("n_sources") >= min_support)
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n_sources").desc(), F.col("alias").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k_per_dst)
    )


def next_frontier(
    links: DataFrame,
    crawled: DataFrame,
    per_host_cap: int = 100,
) -> DataFrame:
    """Crawl-frontier scheduling — closes the crawl loop the other ops
    open (WARC in → pages → links → FRONTIER out): the next fetch list
    is every newly-discovered URL, deduplicated, minus everything
    already crawled, capped per host (politeness: no host monopolizes
    the next wave) and deterministically ordered within a host by
    in-link support (most-referenced first — the cheap approximation of
    priority-by-authority) then URL.

    crawled: one column `url` (the digest index keeps content dedup;
    this is URL-level). Scale shape: candidate support is one map-side-
    combinable groupBy on dst; the already-crawled exclusion is a LEFT
    ANTI hash join (at 10^12 URLs that side is the materialized frontier
    table the delta applier maintains — never broadcast); the per-host
    cap is a row_number window partitioned by host over the
    ALREADY-AGGREGATED candidate table (one row per distinct URL, so a
    hot host's window buffer is its distinct-URL count, not its raw
    in-link count)."""
    from pyspark.sql import Window

    cand = (
        links.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("n_inlinks"))
        .join(
            crawled.select(F.col("url").alias("dst")).distinct(),
            "dst",
            "left_anti",
        )
        .withColumn("host", F.parse_url("dst", F.lit("HOST")))
        .filter(F.col("host").isNotNull())
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_inlinks").desc(), F.col("dst").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_host_cap)
        .select(F.col("dst").alias("url"), "host", "n_inlinks", "rank")
    )


def host_graph(links: DataFrame) -> DataFrame:
    """Edge list → weighted inter-host graph (self-host edges dropped):
    the table PageRank/HITS/salience consume. One map-side-combinable
    groupBy; host extraction is the JVM parse_url, not Python."""
    hosts = links.select(
        F.parse_url("src", F.lit("HOST")).alias("src_host"),
        F.parse_url("dst", F.lit("HOST")).alias("dst_host"),
    ).filter(
        F.col("src_host").isNotNull()
        & F.col("dst_host").isNotNull()
        & (F.col("src_host") != F.col("dst_host"))
    )
    return hosts.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def robots_admit(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """RFC 9309 URL admission over production tables: frontier rows
    (must carry `host` and `path`; extra columns ride along) against a
    rules table (host, prefix, allow∈{0,1}) — longest matching prefix
    wins, allow beats disallow on equal length, no match → allowed.
    Same decision core the `crawl_robots` gate key certifies cross-engine
    (tests pin parity on the planted fixture).

    Scale shape: the rules table is crawl-config-sized → BROADCAST; the
    frontier never shuffles for the join, and the winner is a
    map-side-combinable groupBy max(struct) — no frontier-wide window."""
    r = rules.select(
        F.col("host").alias("_rh"),
        F.col("prefix").alias("_prefix"),
        F.col("allow").cast("int").alias("_allow"),
    )
    keys = list(frontier.columns)
    m = frontier.join(
        F.broadcast(r),
        (frontier["host"] == r["_rh"])
        & F.expr("startswith(path, _prefix)"),
        "left",
    )
    win = F.max(
        F.struct(
            F.length("_prefix").alias("l"), F.col("_allow").alias("a")
        )
    ).alias("_win")
    return (
        m.groupBy(*keys)
        .agg(win)
        .select(
            *keys,
            F.coalesce(F.col("_win.a"), F.lit(1)).cast("int")
            .alias("allowed"),
            F.coalesce(F.col("_win.l"), F.lit(0)).cast("int")
            .alias("rule_len"),
        )
    )


def politeness_schedule(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    default_delay_ms: int = 1000,
    priority_col: str | None = None,
) -> DataFrame:
    """Assign per-host fetch slots and timestamps: slot = position in
    the host's queue (highest `priority_col` first when given, then url
    for determinism), fetch_at_ms = slot × the host's crawl-delay
    (per-host `delays` table (host, delay_ms) — broadcast — else the
    default). The host-partitioned row_number IS the politeness
    semantics (one fetch per host per delay window); real frontiers
    tier-cut per host before scheduling (crawl_revisit), bounding the
    queue a window partition sees."""
    from pyspark.sql import Window

    order = [F.col("url").asc()]
    if priority_col:
        order = [F.col(priority_col).desc(), F.col("url").asc()]
    w = Window.partitionBy("host").orderBy(*order)
    out = frontier.withColumn(
        "slot", (F.row_number().over(w) - 1).cast("int")
    )
    if delays is not None:
        d = delays.select(
            F.col("host").alias("_dh"),
            F.col("delay_ms").cast("bigint").alias("_delay"),
        )
        out = out.join(
            F.broadcast(d), out["host"] == d["_dh"], "left"
        ).drop("_dh")
        delay = F.coalesce(F.col("_delay"), F.lit(default_delay_ms))
    else:
        delay = F.lit(default_delay_ms)
    return out.withColumn(
        "fetch_at_ms", (F.col("slot") * delay).cast("bigint")
    ).drop("_delay")
