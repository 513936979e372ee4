#!/usr/bin/env python
"""Tokenizer-face scaling sweep (round-10): do the three subword
encoders scale in DISTINCT WORDS, not corpus tokens?

The claim all three faces make (BPE encode, WordPiece walk, Unigram
Viterbi) is that the expensive machinery — substring explode, vocab
join, walk/DP — runs over the distinct-word table only, and the
corpus re-enters solely through the salted doc⋈word count join. At
web scale that asymmetry is the whole story: ~10^7 distinct words
against ~10^11 token occurrences.

The driver testdata cannot probe this (its documents table draws from
a fixed 31-word vocabulary at every sf), so the sweep generates a
deterministic xxhash64 corpus with rows and vocabulary controlled
INDEPENDENTLY, then walks the two axes separately:

- corpus axis: vocabulary FIXED, docs ×4 then ×4 again — wall should
  grow far slower than rows (only the count join sees the corpus);
- vocab axis: docs FIXED, vocabulary ×4 then ×4 again — wall may grow
  toward linear in distinct words (that IS the dominant table).

Writes sweeps/latest/tokenizer_sweep.json with both axes' wall
ratios. Everything xxhash64-derived: rerunnable bit-for-bit.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

WORDS_PER_DOC = 40


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("khronus-tokenizer-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators import text as text_ops

    def synth_docs(n_docs: int, vocab: int):
        """Deterministic corpus: each doc is WORDS_PER_DOC words drawn
        xxhash64-uniformly from a `vocab`-word lexicon of pseudo-words
        (length 3-10 over a-z, themselves xxhash64-derived)."""
        # two nested transforms: word index j -> lexicon id -> the
        # pseudo-word's characters
        text = f"""
          concat_ws(' ', transform(sequence(1, {WORDS_PER_DOC}), j ->
            concat_ws('', transform(
              sequence(0, CAST(3 + pmod(xxhash64(pmod(xxhash64(doc_id, j), {vocab})), 8) AS INT)),
              i -> char(97 + pmod(xxhash64(pmod(xxhash64(doc_id, j), {vocab}), i), 26))))))
        """
        return (
            spark.range(n_docs)
            .withColumnRenamed("id", "doc_id")
            .withColumn("text", F.expr(text))
        )

    faces = {
        "bpe_encode": lambda d: text_ops.bpe_encode(d, k=6),
        "wordpiece_encode": lambda d: text_ops.wordpiece_encode(d),
        "unigram_encode": lambda d: text_ops.unigram_encode(d),
    }

    def run_df(df):
        df.write.format("noop").mode("overwrite").save()

    def measure(n_docs, vocab):
        import tempfile

        path = tempfile.mkdtemp(prefix=f"tok_sweep_{n_docs}_{vocab}_")
        synth_docs(n_docs, vocab).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        dw = (
            docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")))
            .where("col <> ''")
            .distinct()
            .count()
        )
        entry = {"rows": n_docs, "distinct_words": dw, "wall": {}}
        for name, fn in faces.items():
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                run_df(fn(docs))
                w = time.perf_counter() - t0
                best = w if best is None else min(best, w)
            entry["wall"][name] = round(best, 3)
        print((n_docs, vocab), entry, flush=True)
        return entry

    grid = {
        # corpus axis: vocab fixed at 20k, docs x4 x4
        "corpus_axis": [(12_500, 20_000), (50_000, 20_000), (200_000, 20_000)],
        # vocab axis: docs fixed at 50k, vocab x4 x4
        "vocab_axis": [(50_000, 5_000), (50_000, 20_000), (50_000, 80_000)],
    }
    result: dict = {}
    for axis, pts in grid.items():
        levels = [measure(n, v) for n, v in pts]
        steps = []
        for a, b in zip(levels, levels[1:]):
            steps.append(
                {
                    "rows_ratio": round(b["rows"] / a["rows"], 2),
                    "distinct_ratio": round(
                        b["distinct_words"] / a["distinct_words"], 2
                    ),
                    "wall_ratio": {
                        f: round(b["wall"][f] / a["wall"][f], 2)
                        for f in faces
                    },
                }
            )
        result[axis] = {"levels": levels, "steps": steps}
        print(axis, steps, flush=True)

    art = Path(_REPO) / "sweeps" / "latest"
    art.mkdir(parents=True, exist_ok=True)
    (art / "tokenizer_sweep.json").write_text(json.dumps(result, indent=1))
    print(json.dumps({"metric": "tokenizer distinct-word scaling", **result}))
    spark.stop()


if __name__ == "__main__":
    main()
