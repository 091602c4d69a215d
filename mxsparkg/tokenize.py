"""U2 — tokenize + generalize into a nested tokens table (SURVEY.md §2.9 U2).

One output row per (url, sent_id) with an array<struct> of tokens — nested
on purpose so one shuffle row = one sentence until explode-time. The hot
path (detect.py) fuses tokenization into the same Arrow pass and does NOT
read this table; this stage exists for inspection/debugging and for the
tokens-table contract in SURVEY.md §1.2.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from mxsparkg.lexicons import build_lexicons
from mxsparkg.textcore import generalize, split_sentences, tokenize

TOKENS_SCHEMA = (
    "url string, sent_id int, "
    "toks array<struct<tok:string,start:int,end:int,gen:array<string>>>"
)


def tokenize_pages(pages_clean: DataFrame) -> DataFrame:
    lex = build_lexicons()

    def gen_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column("url").to_pylist()
            texts = batch.column("text").to_pylist()
            out_url, out_sid, out_toks = [], [], []
            for url, text in zip(urls, texts):
                sent_id = 0
                pos = 0
                for line in (text or "").split("\n"):
                    toks = tokenize(line)
                    for sent in split_sentences(toks):
                        out_url.append(url)
                        out_sid.append(sent_id)
                        out_toks.append(
                            [
                                {
                                    "tok": t,
                                    "start": pos + s,
                                    "end": pos + e,
                                    "gen": generalize(t, lex),
                                }
                                for t, s, e in sent
                            ]
                        )
                        sent_id += 1
                    pos += len(line) + 1
            yield pa.RecordBatch.from_pydict(
                {
                    "url": pa.array(out_url, pa.string()),
                    "sent_id": pa.array(out_sid, pa.int32()),
                    "toks": pa.array(
                        out_toks,
                        pa.list_(
                            pa.struct(
                                [
                                    ("tok", pa.string()),
                                    ("start", pa.int32()),
                                    ("end", pa.int32()),
                                    ("gen", pa.list_(pa.string())),
                                ]
                            )
                        ),
                    ),
                }
            )

    return pages_clean.select("url", "text").mapInArrow(gen_batches, TOKENS_SCHEMA)
