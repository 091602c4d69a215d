"""U1 — byte-identical HTML→text extraction (SURVEY.md §2.9 U1).

Vectorized scalar-iterator pandas UDF (Arrow-batched; the iterator form
amortizes per-worker setup and keeps memory bounded batch-by-batch — no
per-row Python, per BASELINE.json input_hint). The extraction function is
mxsparkg.textcore.pinned_extract, shared verbatim with reference_impl/, so
extracted text per url is byte-identical to the reference by construction.

Scale notes: `html` is the fat column — extract early, then `select` it away
so Catalyst never carries it past this stage (column pruning asserted in
tests/test_pipeline.py via explain()).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from mxsparkg.textcore import pinned_extract


# DataType object (not DDL string): importable without an active session
@pandas_udf(StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield s.map(lambda b: pinned_extract(b) if b is not None else "")


def extract_pages(pages: DataFrame, trust_text: bool = False) -> DataFrame:
    """pages(url, warc_ts, html, text?, lang) → pages_clean(url, warc_ts,
    lang, text, text_sha2, host). Drops `html` immediately (P1)."""
    if trust_text and "text" in pages.columns:
        text_col = F.col("text")
    else:
        text_col = extract_text_udf(F.col("html"))
    # two-step projection so the UDF is evaluated exactly once per row
    clean = pages.select("url", "warc_ts", "lang", text_col.alias("text"))
    return clean.select(
        "url",
        "warc_ts",
        "lang",
        "text",
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha2"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
    )
