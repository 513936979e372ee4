"""Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical BM25
list and a semantic embedding-cosine list per query.

The modern retrieval stack runs BOTH retrievers — sparse BM25 catches
exact terminology, dense cosine catches paraphrase — and fuses the two
rankings with RRF (Cormack/Clarke/Buettcher, SIGIR'09):

    rrf(d) = Σ_lists 1 / (k_rrf + rank_list(d))

RRF needs only the RANKS, never the incomparable raw scores (BM25's
integer saturation sum vs a [-1, 1] cosine), which is exactly why it is
the standard fusion: no score normalization, no tuning beyond k_rrf=60.
The engine keeps the repo's integer discipline: each list contributes
``1_000_000 div (k_rrf + rank)`` (micro-units, floor), so the fused
score is a BIGINT and cross-engine hashes are exact.

Shape at 100 TB: the two branch top-k's are the already-hardened
retrieval paths (`text.bm25_rank`: one map-side-combinable postings
shuffle + broadcast query probe + WindowGroupLimit top-k;
brute/indexed ANN: broadcast probes over an embarrassingly-parallel
scan, WindowGroupLimit top-k). Fusion itself touches only the two
pool frames — #queries × pool rows each, INDEPENDENT of corpus size —
so the full-outer merge join and the final per-query window are
asymptotically free; the corpus is scanned once per branch and never
again. Reference parity: the reference has no retrieval surface —
this extends the ANN/BM25 arc the north-star pipeline needs for
retrieval-based curation (dedup/decontamination/RAG audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from khronus_spark.operators.similarity import cosine_col
from khronus_spark.operators.text import (
    bm25_rank,
    bm25_rank_indexed,
    bm25_rank_sql_parts,
)
from khronus_spark.sources.tables import spread

#: the standard RRF smoothing constant (SIGIR'09 uses 60).
K_RRF = 60


def semantic_eval_rank(
    embeddings: DataFrame,
    eval_mod: int = 97,
    pool: int = 20,
    broadcast_probes: bool = True,
) -> DataFrame:
    """(query_id, doc_id, rank) — exact cosine top-`pool` corpus
    vectors per eval query, with the SAME query/corpus carve as
    `text.bm25_rank`: ``vec_id % eval_mod == 0`` are the probes,
    everything else is corpus (the gate tables' vec ids coincide with
    a PREFIX of the doc ids — at larger SFs embeddings cover only part
    of the corpus, and a query/doc without a vector simply gets no
    semantic list, which the full-outer RRF fusion absorbs). Ties
    break by doc_id; ordering compares the full
    double cosine, which both engines compute with the identical
    left-to-right 64-dim fold (the ANN-family convention), so ranks
    are bit-stable cross-engine.

    `broadcast_probes` is the bm25_rank `broadcast_queries` knob: the
    default pins the hint for benchmark/eval-sized probe sets; a probe
    set that scales WITH the corpus (eval_mod carves ~1/mod of it)
    would OOM a forced broadcast — pass False and AQE sizes the join.
    The brute scan itself is the baseline/eval path; production-scale
    semantic branches swap in the indexed ANN retrievers
    (pq_topk_indexed / ivf_pq_topk_indexed) and fuse their ranks the
    same way."""
    probes = embeddings.where(F.col("vec_id") % eval_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("probe_vec"),
    )
    if broadcast_probes:
        probes = F.broadcast(probes)
    corpus = spread(
        embeddings.where(F.col("vec_id") % eval_mod != 0), max_partitions=8
    )
    scored = corpus.crossJoin(probes).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        cosine_col(F.col("probe_vec"), F.col("embedding")).alias("_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= pool)
        .select("query_id", "doc_id", F.col("rank").cast("long").alias("rank"))
    )


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    k_rrf: int = K_RRF,
    k: int = 10,
) -> DataFrame:
    """Fuse two (query_id, doc_id, rank) lists into the RRF top-`k`.

    Output: (query_id, doc_id, lex_rank, sem_rank, rrf_score, rank).
    A doc absent from one list contributes 0 from that list and
    reports rank 0 there ("not in pool" — distinguishable because real
    ranks are ≥ 1). Final order: rrf_score DESC, doc_id ASC; docs
    surfaced by BOTH retrievers dominate, which is RRF's point.

    Both inputs are pool frames (#queries × pool rows), so every join
    and window here is on data whose size is set by the QUERY load,
    not the corpus — fusion adds nothing to the corpus-side cost."""
    # union + one aggregate instead of a full-outer sort-merge join:
    # each branch contributes ≤1 row per (query_id, doc_id), so
    # max(branch rank) over the union reproduces the outer join's rows
    # exactly (null where a branch lacks the doc). One exchange on
    # query_id serves the aggregate (partitioning on a subset of the
    # group keys satisfies the clustered distribution) AND the final
    # window — the former plan exchanged both join inputs and then the
    # window a third time (guide §2.4).
    l = lex.select(
        "query_id",
        "doc_id",
        F.col("rank").alias("lex_rank"),
        F.lit(None).cast("long").alias("sem_rank"),
    )
    s = sem.select(
        "query_id",
        "doc_id",
        F.lit(None).cast("long").alias("lex_rank"),
        F.col("rank").alias("sem_rank"),
    )
    fused = (
        l.unionByName(s)
        .repartition(F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.max("lex_rank").alias("lex_rank"),
            F.max("sem_rank").alias("sem_rank"),
        )
        .withColumn(
            "rrf_score",
            F.expr(
                f"CASE WHEN lex_rank IS NULL THEN 0L "
                f"ELSE 1000000L div ({k_rrf} + lex_rank) END + "
                f"CASE WHEN sem_rank IS NULL THEN 0L "
                f"ELSE 1000000L div ({k_rrf} + sem_rank) END"
            ),
        )
        .withColumn("lex_rank", F.coalesce("lex_rank", F.lit(0).cast("long")))
        .withColumn("sem_rank", F.coalesce("sem_rank", F.lit(0).cast("long")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "lex_rank", "sem_rank", "rrf_score", "rank"
        )
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    eval_mod: int = 97,
    pool: int = 20,
    k: int = 10,
    k_rrf: int = K_RRF,
    broadcast_queries: bool = True,
) -> DataFrame:
    """The composed hybrid retriever: BM25 top-`pool` (lexical) ⊕
    cosine top-`pool` (semantic) → RRF top-`k` per eval query.
    `broadcast_queries` flows to BOTH branches' query-side join hints
    (see their docstrings for the scale rule)."""
    lex = bm25_rank(
        docs, eval_mod=eval_mod, k=pool, broadcast_queries=broadcast_queries
    )
    sem = semantic_eval_rank(
        embeddings,
        eval_mod=eval_mod,
        pool=pool,
        broadcast_probes=broadcast_queries,
    )
    return rrf_fuse(lex, sem, k_rrf=k_rrf, k=k)


def build_hybrid_index(
    corpus: DataFrame,
    embeddings: DataFrame,
    out_dir: str,
    sub: int = 4,
    pq_k: int = 8,
    iters: int = 1,
) -> None:
    """Build BOTH branch indexes of the hybrid retriever —
    `{out_dir}/bm25` (postings + query-time constants) and
    `{out_dir}/pq` (codebooks + codes) — CONCURRENTLY (guide §2.6):
    the two builds share no state, and each is a chain of small
    sequential jobs whose tails leave executor threads idle, so
    overlapping them cuts the build wall toward max(branch) with
    byte-identical artifacts. The per-branch builders are the same
    `text.write_bm25_index` / `pq.pq_build_index`+`write_pq_index`
    lifecycle callers use standalone."""
    from concurrent.futures import ThreadPoolExecutor

    from khronus_spark.operators import pq as pq_ops
    from khronus_spark.operators import text as text_ops

    def _bm25() -> None:
        text_ops.write_bm25_index(
            text_ops.bm25_build_postings(corpus), f"{out_dir}/bm25"
        )

    def _pq() -> None:
        books, codes = pq_ops.pq_build_index(
            embeddings, sub=sub, k=pq_k, iters=iters
        )
        pq_ops.write_pq_index(books, codes, f"{out_dir}/pq")

    with ThreadPoolExecutor(max_workers=2) as pool:
        fb = pool.submit(_bm25)
        fp = pool.submit(_pq)
        fb.result()
        fp.result()


def semantic_pq_rank(
    books: DataFrame,
    codes: DataFrame,
    probes: DataFrame,
    eval_mod: int = 97,
    pool: int = 20,
    sub: int = 4,
    pq_k: int = 8,
) -> DataFrame:
    """(query_id, doc_id, rank) — the INDEX-BACKED semantic branch:
    ADC top-`pool` per probe from a persisted PQ index
    (`pq.pq_build_index` → `write_pq_index`/`read_pq_index`), scanning
    only the CORPUS carve of the code table (``vec_id % eval_mod != 0``
    — the brute branch's query/corpus split; the index itself trains on
    every vector, the FAISS train-on-all/add-all convention, so one
    index serves any later carve). No training, no full-vector scan:
    the query-time work is the per-probe sub×k LUT build (broadcast)
    plus `sub` table adds per 8-byte code — the production-scale swap
    the brute `semantic_eval_rank` docstring promises. Ranks order by
    (d2_adc ASC, doc_id ASC) over the ≤pool surviving rows — a
    query-load-sized window."""
    from khronus_spark.operators.pq import pq_topk_indexed

    corpus_codes = codes.where(F.col("vec_id") % eval_mod != 0)
    topk = pq_topk_indexed(books, corpus_codes, probes, pool, sub, pq_k)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("d2_adc").asc(), F.col("neighbor_id").asc()
    )
    return topk.select(
        F.col("probe_id").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def hybrid_rrf_topk_indexed(
    postings: DataFrame,
    books: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    probes: DataFrame,
    eval_mod: int = 97,
    pool: int = 20,
    k: int = 10,
    k_rrf: int = K_RRF,
    sub: int = 4,
    pq_k: int = 8,
    broadcast_queries: bool = True,
    df_t: DataFrame | None = None,
    collection_stats: tuple[int, int] | None = None,
    max_impact: DataFrame | None = None,
    seed_df_budget: int = 1000,
    auto_max_impact: DataFrame | None = None,
    crossover: int | None = None,
) -> DataFrame:
    """The PRODUCTION hybrid retriever: both branches answer from
    PERSISTED indexes — BM25 from the postings table
    (`text.bm25_rank_indexed`: no corpus tokenization at query time;
    pass `df_t`/`collection_stats` from `read_bm25_stats` and the
    query plan has no aggregate over the postings either) and the
    semantic list from the PQ index (`semantic_pq_rank`: no training,
    8-byte code scan) — fused by the same integer RRF as
    `hybrid_rrf_topk`. The corpus text and the full embedding vectors
    are never touched at query time; at 100 TB the query cost is two
    index scans + query-load-sized fusion, vs the brute face's
    full-corpus tokenize + full-vector cosine per query load.

    `max_impact` (from `text.read_bm25_max_impact`) switches the BM25
    branch to the EXACT WAND-pruned path
    (`text.bm25_rank_indexed_pruned`) — bit-identical lexical ranks
    by the pruning proof, so the fused output and the oracle are
    unchanged; the remaining scoring-mass cost (the round-7 verdict's
    named ceiling for this face) drops with the cut posting lists.
    Requires the persisted constants when set.

    `auto_max_impact` ROUTES instead of forcing (round-8 verdict
    directive #2): pass the persisted ceilings unconditionally and
    the face reads `collection_stats[0]` (n_docs — already in hand
    from the index) and serves the pruned branch only past the
    measured pool=20 crossover (~100k docs, scripts/hybrid_sweep.py:
    2.02x vs brute at 105k but 0.44x at 50k — the pool needs 20 seed
    docs per threshold, so the crossover sits later than the k=5
    standalone face's ~50k). `max_impact` stays the explicit
    force-pruned override; `crossover` re-pins the boundary for
    deployments that re-measure.

    `queries` is (query_id, text); `probes` is (probe_id, embedding)
    — the same eval carve on both tables (ids coincide where
    embeddings cover the docs; the full-outer RRF absorbs gaps)."""
    if max_impact is None and auto_max_impact is not None:
        from khronus_spark.operators.text import wand_should_prune

        if collection_stats is not None and wand_should_prune(
            int(collection_stats[0]), pool=pool, crossover=crossover
        ):
            max_impact = auto_max_impact
    if max_impact is not None:
        from khronus_spark.operators.text import bm25_rank_indexed_pruned

        lex = bm25_rank_indexed_pruned(
            postings,
            max_impact,
            queries,
            k=pool,
            df_t=df_t,
            collection_stats=collection_stats,
            broadcast_queries=broadcast_queries,
            seed_df_budget=seed_df_budget,
        ).select("query_id", "doc_id", "rank")
        sem = semantic_pq_rank(
            books, codes, probes, eval_mod=eval_mod, pool=pool, sub=sub,
            pq_k=pq_k,
        )
        return rrf_fuse(lex, sem, k_rrf=k_rrf, k=k)
    # FUSED TAIL (non-pruned path): both branches' map-side scores
    # union FIRST, then ONE exchange on query_id serves every
    # query-load-sized step — the per-branch pool ranking (window
    # partitioned by (branch, query): hash(query_id) is a subset of
    # the clustering keys, so no re-exchange), the RRF aggregate on
    # (query, doc), and the final top-k window. The unfused form
    # exchanged each branch for its own rank window and then again to
    # fuse (guide §2.4 — operations keyed the same way share one
    # exchange). Rank and score semantics are verbatim: lex orders by
    # (score DESC, doc_id), sem by (d2_adc ASC, neighbor_id), both
    # expressed as (_skey ASC, doc_id ASC) with _skey = -score / d2.
    from khronus_spark.operators.pq import _QUANT_COL, _adc_luts, _adc_scored
    from khronus_spark.operators.text import bm25_scored_indexed

    lex_s = bm25_scored_indexed(
        postings,
        queries,
        broadcast_queries=broadcast_queries,
        share_postings=False,
        df_t=df_t,
        collection_stats=collection_stats,
    )
    corpus_codes = codes.where(F.col("vec_id") % eval_mod != 0)
    pvec = probes.select(
        "probe_id", F.expr(_QUANT_COL.format(c="embedding")).alias("pe")
    )
    sem_s = _adc_scored(
        corpus_codes, _adc_luts(pvec, books, sub, pq_k), sub, pq_k
    )
    u = lex_s.select(
        "query_id",
        "doc_id",
        F.lit(0).alias("_br"),
        (-F.col("score")).alias("_skey"),
    ).unionByName(
        sem_s.select(
            F.col("probe_id").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            F.lit(1).alias("_br"),
            F.col("d2_adc").alias("_skey"),
        )
    )
    u = u.repartition(F.col("query_id"))
    w_b = Window.partitionBy("_br", "query_id").orderBy(
        F.col("_skey").asc(), F.col("doc_id").asc()
    )
    ranked = (
        u.withColumn("rank", F.row_number().over(w_b).cast("long"))
        .where(F.col("rank") <= pool)
    )
    fused = (
        ranked.groupBy("query_id", "doc_id")
        .agg(
            F.max(F.when(F.col("_br") == 0, F.col("rank"))).alias("lex_rank"),
            F.max(F.when(F.col("_br") == 1, F.col("rank"))).alias("sem_rank"),
        )
        .withColumn(
            "rrf_score",
            F.expr(
                f"CASE WHEN lex_rank IS NULL THEN 0L "
                f"ELSE 1000000L div ({k_rrf} + lex_rank) END + "
                f"CASE WHEN sem_rank IS NULL THEN 0L "
                f"ELSE 1000000L div ({k_rrf} + sem_rank) END"
            ),
        )
        .withColumn("lex_rank", F.coalesce("lex_rank", F.lit(0).cast("long")))
        .withColumn("sem_rank", F.coalesce("sem_rank", F.lit(0).cast("long")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "lex_rank", "sem_rank", "rrf_score", "rank"
        )
    )


def hybrid_rrf_indexed_sql(
    eval_mod: int = 97,
    pool: int = 20,
    k: int = 10,
    k_rrf: int = K_RRF,
    sub: int = 4,
    pq_k: int = 8,
    iters: int = 1,
) -> str:
    """Oracle for the indexed face: the bm25 CTE chain (structural
    share) + the PQ ADC score CTEs (training on all vectors, corpus
    carve on the neighbor side — exactly what the persisted index
    computes) + the identical RRF merge. The index build is
    deterministic, so restating it inline IS the persisted index's
    content — the same oracle-of-an-indexed-face convention as
    ann_pq_topk_indexed."""
    from khronus_spark.operators.pq import _adc_score_ctes

    ctes, final = bm25_rank_sql_parts(eval_mod, pool)
    adc = _adc_score_ctes(
        None,
        sub,
        pq_k,
        iters,
        probe_pred=f"pr.vec_id % {eval_mod} = 0",
        neighbor_pred=f"neighbor_id % {eval_mod} <> 0",
    )
    return f"""
WITH {ctes},
lex AS ({final}),
{adc},
sem AS (
  SELECT probe_id AS query_id, neighbor_id AS doc_id,
         CAST(row_number() OVER (
             PARTITION BY probe_id ORDER BY d2_adc ASC, neighbor_id ASC) AS BIGINT)
           AS sem_rank
  FROM score
  QUALIFY sem_rank <= {pool}
),
fused AS (
  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         coalesce(l.doc_id, s.doc_id) AS doc_id,
         CAST(coalesce(l.rank, 0) AS BIGINT) AS lex_rank,
         CAST(coalesce(s.sem_rank, 0) AS BIGINT) AS sem_rank,
         CAST(CASE WHEN l.rank IS NULL THEN 0
                   ELSE 1000000 // ({k_rrf} + l.rank) END
            + CASE WHEN s.sem_rank IS NULL THEN 0
                   ELSE 1000000 // ({k_rrf} + s.sem_rank) END AS BIGINT) AS rrf_score
  FROM lex l
  FULL OUTER JOIN sem s ON l.query_id = s.query_id AND l.doc_id = s.doc_id
)
SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT) AS rank
FROM fused
QUALIFY rank <= {k}
"""


def hybrid_rrf_sql(
    eval_mod: int = 97, pool: int = 20, k: int = 10, k_rrf: int = K_RRF
) -> str:
    """Oracle: the bm25_rank CTE chain (shared structurally via
    `bm25_rank_sql_parts`, pool-sized) + an independent SQL restatement
    of the cosine branch and the RRF merge."""
    ctes, final = bm25_rank_sql_parts(eval_mod, pool)
    return f"""
WITH {ctes},
lex AS ({final}),
probes AS (
  SELECT vec_id AS query_id, embedding AS probe_vec
  FROM embeddings WHERE vec_id % {eval_mod} = 0
),
sem AS (
  SELECT query_id, vec_id AS doc_id,
         CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS sem_rank
  FROM (
    SELECT p.query_id, e.vec_id,
           list_sum(list_transform(range(1, 65),
               i -> CAST(p.probe_vec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(range(1, 65),
               i -> CAST(p.probe_vec[i] AS DOUBLE) * CAST(p.probe_vec[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, 65),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
           AS sim
    FROM probes p JOIN embeddings e ON e.vec_id % {eval_mod} <> 0
  )
  QUALIFY sem_rank <= {pool}
),
fused AS (
  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         coalesce(l.doc_id, s.doc_id) AS doc_id,
         CAST(coalesce(l.rank, 0) AS BIGINT) AS lex_rank,
         CAST(coalesce(s.sem_rank, 0) AS BIGINT) AS sem_rank,
         CAST(CASE WHEN l.rank IS NULL THEN 0
                   ELSE 1000000 // ({k_rrf} + l.rank) END
            + CASE WHEN s.sem_rank IS NULL THEN 0
                   ELSE 1000000 // ({k_rrf} + s.sem_rank) END AS BIGINT) AS rrf_score
  FROM lex l
  FULL OUTER JOIN sem s ON l.query_id = s.query_id AND l.doc_id = s.doc_id
)
SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT) AS rank
FROM fused
QUALIFY rank <= {k}
"""
