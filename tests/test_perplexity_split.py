"""CCNet head/middle/tail perplexity split: tercile semantics, tie
handling, carry-column identity, and the no-self-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from khronus_spark.operators import text as text_ops


def _fixture(spark):
    # one language, nine docs with strictly different token rarity:
    # doc i repeats a common filler plus i distinct rare tokens, so the
    # mean surprisal strictly increases with i
    rows = []
    for i in range(9):
        toks = ["the"] * 12 + [f"rare{i}_{j}" for j in range(i + 1)]
        rows.append((i, " ".join(toks), "en", "s", len(" ".join(toks))))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_terciles_are_thirds_in_rank_order(spark):
    docs = _fixture(spark)
    out = text_ops.perplexity_split(docs).collect()
    by_split = {}
    for r in out:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert by_split["head"] == {0, 1, 2}
    assert by_split["middle"] == {3, 4, 5}
    assert by_split["tail"] == {6, 7, 8}
    # head = LOWEST mean surprisal (most predictable), the CCNet order
    means = {r["doc_id"]: r["mean_surprisal_mbits"] for r in out}
    assert max(means[d] for d in by_split["head"]) <= min(
        means[d] for d in by_split["middle"]
    )


def test_tie_mass_splits_by_salt_deterministically(spark):
    """A duplicate-heavy corpus (every doc the same text → one mean
    value) must still cut into thirds: the md5(doc_id) salt splits the
    tie mass into sub-cells and cuts land between them. The assignment
    is a pure function of doc_id — re-running yields identical rows."""
    rows = [(i, "same same same", "en", "s", 14) for i in range(60)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = text_ops.perplexity_split(docs).collect()
    sizes = {}
    for r in out:
        sizes[r["split"]] = sizes.get(r["split"], 0) + 1
    # 60 identical docs over 64 salts: every bucket populated, roughly
    # thirds (residual granularity = one salt cell)
    assert set(sizes) == {"head", "middle", "tail"}
    assert all(10 <= v <= 30 for v in sizes.values()), sizes
    again = text_ops.perplexity_split(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_split_is_per_language(spark, sf_dir):
    """Each language is cut into its own thirds: per-lang bucket sizes
    differ by at most the tie mass, and every lang has all buckets
    (the gate corpus has ≥ 3 docs per lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text_ops.perplexity_split(docs)
    sizes = (
        out.groupBy("lang", "split").count().collect()
    )
    langs = {r["lang"] for r in sizes}
    per_lang = {}
    for r in sizes:
        per_lang.setdefault(r["lang"], {})[r["split"]] = r["count"]
    for lang in langs:
        assert set(per_lang[lang]) == {"head", "middle", "tail"}, lang


def test_carry_cols_identity(spark, sf_dir):
    """unigram_surprisal(carry_cols=('lang',)) must equal the plain
    form row-for-row once the carried column is dropped — the carry is
    free metadata on the group key, never a semantic change."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = text_ops.unigram_surprisal(docs).collect()
    carried = text_ops.unigram_surprisal(docs, carry_cols=("lang",)).drop("lang").collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, carried))


def test_split_plan_has_no_corpus_self_join(spark, oracle_sf_dir):
    """lang rides the surprisal group keys; the bucket table attaches
    by BROADCAST. A SortMergeJoin or a second corpus scan means the
    corpus-growing self-join came back."""
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    df = text_ops.perplexity_split(docs)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the surprisal build is lazily checkpointed (shared subtree), so
    # at most one scan survives in the visible plan
    assert plan.count("documents.parquet") <= 1
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_non_tercile_split_engine_and_oracle_agree(spark, sf_dir):
    """n_buckets != 3 switches both engines to 'qN' labels — the pair
    must stay value-identical away from the default (the review found
    the oracle hard-coded head/middle/tail)."""
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["doc_id"], r["bucket"], r["split"])
        for r in text_ops.perplexity_split(docs, n_buckets=4).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        (r[0], r[3], r[4])
        for r in con.execute(text_ops.perplexity_split_sql(4)).fetchall()
    }
    assert got == want
    assert {s for _, _, s in got} == {"q0", "q1", "q2", "q3"}
