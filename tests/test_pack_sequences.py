"""Semantic tests for concat-and-chunk sequence packing
(operators/text.py::pack_sequences)."""

from __future__ import annotations

from khronus_spark.operators.text import pack_sequences


def test_offsets_contiguous_and_packs_chunked(spark):
    docs = spark.createDataFrame(
        [
            # shard 0 (doc_id % 2 == 0): 3 + 4 + 2 tokens
            (0, "a b c"),
            (2, "d e f g"),
            (4, "h i"),
            # shard 1: 5 tokens
            (1, "p q r s t"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in pack_sequences(docs, budget=4, n_shards=2).collect()
    }
    # shard-0 stream: [0:3)=doc0, [3:7)=doc2, [7:9)=doc4 — budget 4
    assert rows[0] == dict(
        doc_id=0, shard=0, n_tokens=3, offset=0, pack_first=0, pack_last=0
    )
    assert rows[2] == dict(
        doc_id=2, shard=0, n_tokens=4, offset=3, pack_first=0, pack_last=1
    )  # straddles the pack boundary at 4
    assert rows[4] == dict(
        doc_id=4, shard=0, n_tokens=2, offset=7, pack_first=1, pack_last=2
    )
    # shard-1 stream independent of shard 0
    assert rows[1] == dict(
        doc_id=1, shard=1, n_tokens=5, offset=0, pack_first=0, pack_last=1
    )
