"""Hyperlink-graph extraction: RFC-3986 resolution cases pinned on the
pure parser, the Arrow extraction pass, host-graph rollup, and the full
crawl-native composition WARC bytes → links → host graph → PageRank."""

from __future__ import annotations


def test_iter_links_resolution_cases():
    """The resolution table a reviewer checks by hand: relative paths,
    parent traversal, absolute, protocol-relative, fragments stripped,
    non-http schemes dropped, broken markup tolerated."""
    from mxsparkg.weblinks import iter_links

    html = """
    <html><body>
      <a href="b.html">rel</a>
      <a href="../up.html">parent</a>
      <a href="/root.html">abs-path</a>
      <a href="https://other.com/x">absolute</a>
      <a href="//cdn.com/y">protocol-relative</a>
      <a href="c.html#frag">fragged</a>
      <a href="#only-frag">self</a>
      <a href="mailto:x@y.z">mail</a>
      <a href="javascript:void(0)">js</a>
      <a href="d.html">multi <b>word</b> anchor</a>
      <a href="broken.html">never closed
    </body></html>"""
    got = iter_links("http://ex.com/dir/page.html", html)
    urls = [u for u, _ in got]
    assert urls == [
        "http://ex.com/dir/b.html",
        "http://ex.com/up.html",
        "http://ex.com/root.html",
        "https://other.com/x",
        "http://cdn.com/y",
        "http://ex.com/dir/c.html",
        # "#only-frag" resolves to the page itself → fragment stripped →
        # the page URL, which IS http(s): kept (self-link, a real edge)
        "http://ex.com/dir/page.html",
        "http://ex.com/dir/d.html",
        "http://ex.com/dir/broken.html",
    ]
    anchors = dict(got)
    assert anchors["http://ex.com/dir/d.html"] == "multi word anchor"


def test_extract_links_and_host_graph_and_pagerank(spark):
    """End to end from crawl bytes: pages (via the WARC reader) → link
    edges → weighted host graph (self-host edges dropped) → integer-mass
    PageRank ranks the planted authority host first."""
    import os
    import shutil

    from mxsparkg.graphquery import pagerank_exact
    from mxsparkg.warc import read_warc, write_warc
    from mxsparkg.weblinks import extract_links, host_graph

    def page(host, path, hrefs):
        body = "<html><body>" + "".join(
            f'<a href="{h}">x</a>' for h in hrefs
        ) + "</body></html>"
        return {
            "url": f"http://{host}{path}",
            "date": "2026-03-04T05:06:07Z",
            "body": body.encode(),
            "rec_type": "response",
        }

    # hub.com points everywhere; every site points at authority.com
    # (authority links back out so it is a src node — pagerank_exact
    # ranks src nodes; a pure sink would fall out of the rank table)
    recs = [
        page("hub.com", "/a", ["http://s1.com/", "http://s2.com/",
                               "http://authority.com/", "/b"]),
        page("hub.com", "/b", ["http://authority.com/", "#top"]),
        page("s1.com", "/", ["http://authority.com/", "http://hub.com/a"]),
        page("s2.com", "/", ["http://authority.com/x"]),
        page("authority.com", "/", ["http://s2.com/about"]),
    ]
    root = "/tmp/mxsparkg_test_weblinks"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    write_warc(f"{root}/crawl.warc.gz", recs, gzip_members=True)

    pages = read_warc(spark, root)
    links = extract_links(pages)
    rows = {(r.src, r.dst) for r in links.collect()}
    assert ("http://hub.com/a", "http://hub.com/b") in rows  # rel resolved
    assert ("http://hub.com/b", "http://hub.com/b") in rows  # frag stripped

    hg = {(r.src_host, r.dst_host): r.n_links
          for r in host_graph(links).collect()}
    assert hg[("hub.com", "authority.com")] == 2
    assert ("hub.com", "hub.com") not in hg  # self-host dropped

    edges = host_graph(links).select(
        "src_host", "dst_host", "n_links"
    ).withColumnRenamed("src_host", "src").withColumnRenamed(
        "dst_host", "dst")
    pr = pagerank_exact(edges.select("src", "dst"), iters=5)
    top = pr.orderBy(pr.pr.desc()).first()
    assert top.src == "authority.com"


def test_anchor_aliases_support_and_topk(spark):
    """Alias mining: distinct-SOURCE support (the same page linking
    twice is one vote), min_support filter, case/space normalization,
    and deterministic per-dst top-k."""
    from mxsparkg.weblinks import anchor_aliases

    rows = [
        # 3 distinct pages call T 'acme corp' (one with case/space noise)
        ("http://a.com/1", "http://t.com/", "Acme Corp"),
        ("http://b.com/1", "http://t.com/", "  acme   corp "),
        ("http://c.com/1", "http://t.com/", "acme corp"),
        # one page links twice with 'acme' -> support 1, filtered
        ("http://a.com/1", "http://t.com/", "acme"),
        ("http://a.com/1", "http://t.com/", "acme"),
        # two pages call it 'the acme company'
        ("http://b.com/1", "http://t.com/", "the acme company"),
        ("http://c.com/1", "http://t.com/", "the acme company"),
        # junk: empty + over-long anchors never reach the shuffle
        ("http://a.com/1", "http://t.com/", ""),
        ("http://a.com/1", "http://t.com/", "x" * 200),
    ]
    links = spark.createDataFrame(rows, ["src", "dst", "anchor"])
    got = [
        (r.alias, r.n_sources, r.rank)
        for r in anchor_aliases(links, min_support=2)
        .orderBy("rank").collect()
    ]
    assert got == [("acme corp", 3, 1), ("the acme company", 2, 2)]


def test_next_frontier_dedup_cap_and_priority(spark):
    """The crawl loop's output: already-crawled URLs excluded, duplicate
    discoveries collapsed with in-link support, per-host cap enforced,
    most-referenced URL ranked first within its host."""
    from mxsparkg.weblinks import next_frontier

    links = spark.createDataFrame(
        [
            ("http://a.com/1", "http://new.com/popular", "x"),
            ("http://b.com/1", "http://new.com/popular", "x"),
            ("http://c.com/1", "http://new.com/popular", "x"),
            ("http://a.com/1", "http://new.com/one", "x"),
            ("http://a.com/1", "http://new.com/two", "x"),
            ("http://a.com/1", "http://seen.com/old", "x"),
            ("http://a.com/1", "http://other.com/z", "x"),
        ],
        ["src", "dst", "anchor"],
    )
    crawled = spark.createDataFrame(
        [("http://seen.com/old",)], ["url"]
    )
    got = {
        r.url: (r.host, r.n_inlinks, r.rank)
        for r in next_frontier(links, crawled, per_host_cap=2).collect()
    }
    assert "http://seen.com/old" not in got          # already crawled
    assert got["http://new.com/popular"] == ("new.com", 3, 1)  # priority
    # cap=2 on new.com: popular + the lexicographically-first of one/two
    assert sum(1 for u, (h, _, _) in got.items() if h == "new.com") == 2
    assert "http://new.com/one" in got and "http://new.com/two" not in got
    assert got["http://other.com/z"] == ("other.com", 1, 1)
