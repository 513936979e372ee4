"""Hybrid retrieval (RRF fusion): fusion semantics, branch agreement,
and the plan shape of the composed retriever."""

from __future__ import annotations

from pyspark.sql import functions as F

from khronus_spark.operators import retrieval as ret


def _ranks(rows):
    return [(r["query_id"], r["doc_id"], r["rank"]) for r in rows]


def test_rrf_consensus_beats_single_list_winner(spark):
    """A doc ranked moderately by BOTH retrievers must outrank a doc
    that tops ONE list and is absent from the other — the property
    that makes RRF the standard fusion (1e6/61 = 16393 for a lone #1
    vs 2·1e6/68 = 29410 for a double #8)."""
    lex = spark.createDataFrame(
        [(1, 100, 1)] + [(1, 200, 8)], "query_id long, doc_id long, rank long"
    )
    sem = spark.createDataFrame(
        [(1, 300, 1)] + [(1, 200, 8)], "query_id long, doc_id long, rank long"
    )
    out = ret.rrf_fuse(lex, sem, k=3).orderBy("rank").collect()
    assert [r["doc_id"] for r in out] == [200, 100, 300]
    assert out[0]["rrf_score"] == 2 * (1_000_000 // 68)
    # absent-list sentinel: doc 100 has sem_rank 0, doc 300 lex_rank 0
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc[100]["sem_rank"] == 0 and by_doc[100]["lex_rank"] == 1
    assert by_doc[300]["lex_rank"] == 0 and by_doc[300]["sem_rank"] == 1
    # equal-score tie (100 vs 300, both lone #1) breaks by doc_id
    assert by_doc[100]["rank"] < by_doc[300]["rank"]


def test_rrf_k_rrf_zero_lists_disjoint_queries(spark):
    """Queries present in only one branch still fuse (full-outer)."""
    lex = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rank long")
    sem = spark.createDataFrame([(2, 20, 1)], "query_id long, doc_id long, rank long")
    out = ret.rrf_fuse(lex, sem, k=5).collect()
    assert sorted(_ranks(out)) == [(1, 10, 1), (2, 20, 1)]


def test_semantic_rank_matches_brute_force_on_eval_carve(spark, sf_dir):
    """The semantic branch must agree with the proven brute-force ANN
    ordering when restricted to the same probe/corpus carve."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sem = ret.semantic_eval_rank(emb, eval_mod=97, pool=5)
    rows = sem.collect()
    probes = [r[0] for r in emb.where("vec_id % 97 = 0").select("vec_id").collect()]
    assert {r["query_id"] for r in rows} == set(probes)
    # per query: 5 ranks, each 1..5, all neighbors outside the eval carve
    for q in probes:
        mine = sorted(r["rank"] for r in rows if r["query_id"] == q)
        assert mine == [1, 2, 3, 4, 5]
    assert all(r["doc_id"] % 97 != 0 for r in rows)


def test_hybrid_plan_shape(spark, oracle_sf_dir):
    """Corpus-side discipline of the composed retriever: documents are
    scanned once (checkpointed postings feed probe + df), the BM25
    query side broadcasts, and no cartesian/nested-loop join appears
    on a corpus-sized frame (the only BroadcastNestedLoopJoin is the
    cosine branch's broadcast-probes cross, by design)."""
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{oracle_sf_dir}/embeddings.parquet")
    df = ret.hybrid_rrf_topk(docs, emb)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("documents.parquet") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # pool-frame fusion may sort-merge (full outer over #queries × pool
    # rows — query-load-sized, never corpus-sized); final per-query
    # top-k must stay group-limit bounded
    assert "WindowGroupLimit" in plan


def test_hybrid_rrf_end_to_end_values(spark, sf_dir):
    """End-to-end on the sf0.001 tables: fused ranks are a permutation
    of 1..k per query and rrf_score is consistent with the reported
    branch ranks."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ret.hybrid_rrf_topk(docs, emb, pool=10, k=5).collect()
    assert out
    for r in out:
        expect = 0
        if r["lex_rank"]:
            expect += 1_000_000 // (60 + r["lex_rank"])
        if r["sem_rank"]:
            expect += 1_000_000 // (60 + r["sem_rank"])
        assert r["rrf_score"] == expect
    qs = {r["query_id"] for r in out}
    for q in qs:
        ranks = sorted(r["rank"] for r in out if r["query_id"] == q)
        assert ranks == list(range(1, len(ranks) + 1))


def test_bm25_chunk_rank_finds_needle_in_long_doc(spark):
    """The long-document fix: a relevant paragraph buried in a long
    doc must score like the paragraph (chunk-level dl normalization),
    and the returned span must point AT the buried paragraph."""
    from khronus_spark.operators.text import bm25_chunk_rank

    filler = " ".join(f"filler{i % 37}" for i in range(400))
    needle = "zebra quagga okapi zebra quagga okapi"
    rows = [
        # query doc (doc_id % 97 == 0)
        (0, "zebra quagga okapi", "en", "s", 20),
        # long doc: needle buried after 400 filler tokens
        (1, filler + " " + needle + " " + filler, "en", "s", 100),
        # distractor docs sharing no terms
        (2, "lorem ipsum dolor sit amet", "en", "s", 30),
        (3, "alpha beta gamma delta", "en", "s", 25),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = bm25_chunk_rank(docs, eval_mod=97, k=3, pool=10).collect()
    assert out, "needle doc not retrieved"
    top = sorted(out, key=lambda r: r["rank"])[0]
    assert top["query_id"] == 0 and top["doc_id"] == 1
    # the winning chunk must cover the needle (tokens 401..406): its
    # 64-token window starting at best_chunk_start must intersect it
    start = top["best_chunk_start"]
    assert start <= 401 <= start + 63 or start <= 406 <= start + 63, top
