"""Invariant tests for the corpus-prep operators added in round 2:
gopher_rules, dup_ngram_fraction, semantic_dedup, curriculum_shards.
Constructed micro-fixtures pin the semantic contracts the oracle-parity
hash can't express (monotonicity, keep-at-least-one, exact-duplicate
behavior)."""

from __future__ import annotations

from pyspark.sql import functions as F

from khronus_spark.operators.clustering import semantic_dedup
from khronus_spark.operators.curation import curriculum_shards
from khronus_spark.operators.text import dup_ngram_fraction, gopher_rules


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, n_chars LONG",
    )


def test_gopher_keep_is_conjunction_and_bounds(spark, oracle_sf_dir):
    from khronus_spark.sources.tables import load_table

    out = gopher_rules(load_table(spark, oracle_sf_dir, "documents"))
    bad = out.where(
        F.col("keep")
        != (
            F.col("r_len")
            & F.col("r_word_len")
            & F.col("r_stop")
            & F.col("r_alpha")
        )
    ).count()
    assert bad == 0
    assert out.where("alpha_bp < 0 OR alpha_bp > 10000").count() == 0


def test_map_side_helpers_match_join_form(spark, oracle_sf_dir):
    """with_quality / with_gopher_keep are the join-free composition
    forms: their attached columns must be value-identical to the
    standalone quality_score / gopher_rules outputs row for row (the
    curation pipelines rely on this to drop full-corpus self-joins),
    and neither may introduce an exchange (pure projection)."""
    from khronus_spark.operators.text import (
        quality_score,
        with_gopher_keep,
        with_quality,
    )
    from khronus_spark.sources.tables import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")

    wq = with_quality(docs).select("doc_id", "n_tokens", "quality_bp")
    qs = quality_score(docs).select("doc_id", "n_tokens", "quality_bp")
    assert wq.schema == qs.schema
    assert wq.exceptAll(qs).count() == 0 and qs.exceptAll(wq).count() == 0

    wg = with_gopher_keep(docs).select("doc_id", "keep")
    gr = gopher_rules(docs).select("doc_id", "keep")
    assert wg.exceptAll(gr).count() == 0 and gr.exceptAll(wg).count() == 0

    for df in (with_quality(docs), with_gopher_keep(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan


def test_gopher_rules_discriminate(spark):
    # too short / no stopwords / huge tokens / clean — one rule each
    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            _docs(
                spark,
                [
                    "the a",  # r_len fails (2 tokens)
                    "zebra quokka wombat numbat dingo koala",  # r_stop fails
                    "the a pneumonoultramicroscopicsilicovolcanoconiosis "
                    "pseudopseudohypoparathyroidism floccinaucinihilipilification "
                    "supercalifragilisticexpialidocious",  # r_word_len fails
                    "the cat sat on a mat and the dog sat too",  # keeps
                ],
            )
        ).collect()
    }
    assert not out[0]["r_len"] and not out[0]["keep"]
    assert not out[1]["r_stop"] and not out[1]["keep"]
    assert not out[2]["r_word_len"] and not out[2]["keep"]
    assert out[3]["keep"]


def test_dup_ngram_exact_copies_saturate(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    out = {
        r["doc_id"]: r
        for r in dup_ngram_fraction(
            _docs(spark, [base, base, "one two three four five six seven"])
        ).collect()
    }
    # verbatim copies: every gram shared -> 10000 bp on both
    assert out[0]["dup_bp"] == 10000 and out[1]["dup_bp"] == 10000
    # the unrelated doc shares nothing
    assert out[2]["dup_bp"] == 0
    for r in out.values():
        assert 0 <= r["dup_bp"] <= 10000 and r["n_dup"] <= r["n_grams"]


def test_semantic_dedup_keeps_one_per_cluster_and_dedups_identicals(spark):
    # 8 vectors: ids 0..3 distinct seeds (also the k=4 init centroids),
    # ids 4..7 exact copies of id 0..3 -> each copy must drop, every
    # cluster keeps its lowest id.
    import math

    def vec(seed):
        return [math.sin(seed * 17.0 + d) for d in range(64)]

    rows = [(i, vec(i), 0) for i in range(4)] + [
        (i + 4, vec(i), 0) for i in range(4)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    out = {r["vec_id"]: r for r in semantic_dedup(emb).collect()}
    assert len(out) == 8
    for i in range(4):
        assert out[i]["kept"], i  # originals (lowest id in their ball)
        assert not out[i + 4]["kept"], i + 4  # exact copies drop
        assert out[i + 4]["cluster"] == out[i]["cluster"]


def test_curriculum_ranks_contiguous_and_cumsum_monotone(spark, oracle_sf_dir):
    from khronus_spark.sources.tables import load_table

    out = curriculum_shards(load_table(spark, oracle_sf_dir, "documents"))
    # ranks are 1..n per shard with no gaps; cum_tokens strictly grows
    agg = out.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.max("curriculum_rank").alias("max_rank"),
        F.countDistinct("curriculum_rank").alias("distinct_ranks"),
    )
    assert agg.where("max_rank != n OR distinct_ranks != n").count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("curriculum_rank")
    regress = out.withColumn("prev", F.lag("cum_tokens").over(w)).where(
        "prev IS NOT NULL AND cum_tokens <= prev"
    )
    assert regress.count() == 0
    # quality ordering: within a shard, quality_bp never increases with rank
    qreg = out.withColumn("prevq", F.lag("quality_bp").over(w)).where(
        "prevq IS NOT NULL AND quality_bp > prevq"
    )
    assert qreg.count() == 0


def test_semantic_dedup_derives_sqrt_k():
    """Fixed k leaves the within-cluster pair count N^2/k (quadratic at
    any setting); the default derives k ~ ceil(sqrt(N)) so total pair
    work is ~N^1.5. The floor keeps tiny corpora on the oracle constant."""
    from khronus_spark.operators.clustering import K, derive_k

    assert derive_k(0) == K and derive_k(8) == K and derive_k(16) == K
    assert derive_k(500) == 23  # ceil(sqrt(500)) = 23
    assert derive_k(5000) == 71
    assert derive_k(10**9) == 31623  # a 1e9-vector corpus
    # sub-quadratic: 10x data -> ~31.6x pair work, not 100x
    pairs = lambda n: n * n // (2 * derive_k(n))
    assert pairs(5000) < 35 * pairs(500)


def test_quality_classifier_deterministic_and_bounded(spark):
    """Weights live in [-1000, 1000]; identical texts score identically;
    empty docs drop (no tokens, no row)."""
    from khronus_spark.operators.text import (
        classifier_weights,
        quality_classifier_score,
    )

    w = classifier_weights(spark)
    stats = w.agg(
        F.min("w").alias("lo"), F.max("w").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert stats["n"] == 1024 and -1000 <= stats["lo"] and stats["hi"] <= 1000

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_classifier_score(docs).collect()}
    assert out[1]["score_x100"] == out[2]["score_x100"]
    assert out[1]["n_tokens"] == 4
    assert 3 not in out  # empty text has no tokens -> no row


def test_duplicate_spans_finds_shared_run_with_exact_bounds(spark):
    """Two docs share a 10-token run (>= min span) embedded at different
    offsets; the detected span must cover exactly that run in each doc,
    and a doc with no cross-doc 5-grams must produce no span."""
    from khronus_spark.operators.text import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d1 = "unique1 unique2 " + shared + " tail1 tail2"
    d2 = "other opening words here " + shared
    d3 = "totally unrelated content with no overlap at all whatsoever now"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in duplicate_spans(docs, n=5, min_tokens=8).collect()}
    assert 3 not in out
    # d1: shared run occupies token positions 3..12 (1-indexed)
    assert (out[1]["span_start"], out[1]["span_end"]) == (3, 12)
    assert out[1]["span_tokens"] == 10
    # d2: run occupies positions 5..14
    assert (out[2]["span_start"], out[2]["span_end"]) == (5, 14)


def test_duplicate_spans_merges_adjacent_grams_single_span(spark):
    """Consecutive duplicated grams must merge into ONE maximal span,
    not one span per gram."""
    from khronus_spark.operators.text import duplicate_spans

    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = duplicate_spans(docs, n=5, min_tokens=8).collect()
    assert len(rows) == 2  # exactly one span per doc
    for r in rows:
        assert (r["span_start"], r["span_end"], r["span_tokens"]) == (1, 10, 10)


def test_spans_consistent_with_dup_ngram_fraction(spark):
    """Cross-operator invariant on random-ish corpora: a document has a
    duplicate span (min_tokens=n) iff its cross-doc duplicated-gram
    count is non-zero, spans are disjoint, in-bounds, and each span of
    length L contains exactly L-n+1 gram positions — so the per-doc sum
    of (L-n+1) equals that doc's count of duplicated POSITIONS, which
    is >= its n_dup (distinct duplicated grams)."""
    import random

    from khronus_spark.operators.text import (
        dup_ngram_fraction,
        duplicate_spans,
        token_stats,
    )

    rng = random.Random(42)
    vocab = [f"w{j}" for j in range(30)]
    shared_phrase = "p1 p2 p3 p4 p5 p6 p7"
    texts = []
    for i in range(20):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(6, 25))]
        if i % 4 == 0:  # a quarter of docs embed the shared phrase
            at = rng.randrange(len(words))
            words[at:at] = shared_phrase.split()
        texts.append((i, " ".join(words)))
    docs = spark.createDataFrame(texts, "doc_id long, text string")

    n = 5
    frac = {r["doc_id"]: r for r in dup_ngram_fraction(docs, n=n).collect()}
    spans = {}
    for r in duplicate_spans(docs, n=n, min_tokens=n).collect():
        spans.setdefault(r["doc_id"], []).append(r)
    ntok = {r["doc_id"]: r["n_tokens"] for r in token_stats(docs).collect()}

    for doc_id, f in frac.items():
        has_span = doc_id in spans
        assert (f["n_dup"] > 0) == has_span, (doc_id, f["n_dup"], has_span)
        if not has_span:
            continue
        ss = sorted(spans[doc_id], key=lambda r: r["span_start"])
        covered = 0
        for a, b in zip(ss, ss[1:]):
            # interval-union semantics: spans are disjoint with at
            # least one uncovered token between them
            assert a["span_end"] + 1 < b["span_start"], (doc_id, a, b)
        for s in ss:
            assert 1 <= s["span_start"] <= s["span_end"] <= ntok[doc_id]
            assert s["span_tokens"] == s["span_end"] - s["span_start"] + 1
            assert s["span_tokens"] >= n
            covered += s["span_tokens"]
        assert covered <= ntok[doc_id]


def test_bpe_merges_greedy_order_and_application(spark):
    """Handcrafted corpus: 'aaab' x3 + 'ab' x2. Pair counts at step 1
    (weighted, greedy-left within a word): (a,a)=6, (a,b)=5 -> first
    merge (a,a). After applying it, 'aaab' -> [aa, a, b], so step 2
    counts (aa,a)=3, (a,b)=5 -> second merge (a,b)."""
    from khronus_spark.operators.text import bpe_merges, bpe_merges_sequential

    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab ab ab")], "doc_id long, text string"
    )
    out = [tuple(r) for r in bpe_merges(docs, k=2).collect()]
    assert out == [(1, "a", "a", 6), (2, "a", "b", 5)]
    # the routed face and the reference recurrence agree on the spec
    assert out == [tuple(r) for r in bpe_merges_sequential(docs, k=2).collect()]


def test_bpe_merges_deterministic_tiebreak(spark):
    """Equal-count pairs must resolve (left, right) lexicographically."""
    from khronus_spark.operators.text import bpe_merges

    docs = spark.createDataFrame(
        [(1, "xy xy za za")], "doc_id long, text string"
    )
    out = [tuple(r) for r in bpe_merges(docs, k=1).collect()]
    assert out == [(1, "x", "y", 2)]  # (x,y) < (z,a) at count 2


def test_bpe_merge_counts_non_increasing(spark):
    """Greedy BPE invariant on random corpora: the argmax at step i
    bounds every later pair count (a merge can only create pairs whose
    occurrences are a subset of an existing pair's), so pair_count is
    non-increasing in rank; every merge's symbol is left||right
    (implicitly: applying it can never raise a count above it)."""
    import random

    rng = random.Random(99)
    for trial in range(3):
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randrange(2, 7)))
            for _ in range(rng.randrange(10, 25))
        ]
        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        from khronus_spark.operators.text import bpe_merges

        out = bpe_merges(docs, k=5).collect()
        counts = [r["pair_count"] for r in sorted(out, key=lambda r: r["rank"])]
        assert counts == sorted(counts, reverse=True), (trial, counts)


def test_bpe_merges_safe_on_backslash_and_quote_symbols(spark):
    """Merge symbols are bound as Column literals, never interpolated
    into SQL text: a learned symbol containing a backslash or quote
    (code-heavy corpora) must neither crash the fold nor change its
    value. One corpus of 'a\\b' x2 + \"it's\" x2: every pair ties at 2,
    so the (l, r) tie-break walks ASCII order — quote (0x27) first, then
    backslash (0x5C) — and each must apply cleanly."""
    from khronus_spark.operators.text import bpe_merges, bpe_merges_batched

    docs = spark.createDataFrame(
        [(1, "a\\b a\\b"), (2, "it's it's")], "doc_id long, text string"
    )
    out = [tuple(r) for r in bpe_merges(docs, k=2).collect()]
    assert out[0] == (1, "'", "s", 2)  # quote symbol merges cleanly
    assert out[1] == (2, "\\", "b", 2)  # backslash neither breaks nor escapes
    assert out == [tuple(r) for r in bpe_merges_batched(docs, k=2).collect()]


def test_bpe_batched_bit_matches_sequential_random_corpora(spark):
    """The batched trainer must reproduce the sequential merge list
    bit-for-bit — ranks, symbols, counts — including under ties and
    merge-created pairs (the descendant hazard the strict-count
    truncation exists for). Random small-alphabet corpora maximize
    symbol collisions between top candidates."""
    import random

    from khronus_spark.operators.text import (
        bpe_merges_batched,
        bpe_merges_sequential,
    )

    rng = random.Random(7)
    for trial in range(3):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randrange(2, 6)))
            for _ in range(rng.randrange(12, 30))
        ]
        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        seq = [tuple(r) for r in bpe_merges_sequential(docs, k=8).collect()]
        bat = [tuple(r) for r in bpe_merges_batched(docs, k=8).collect()]
        assert seq == bat, (trial, seq, bat)


def test_bpe_batched_fewer_passes_on_documents(spark, sf_dir):
    """On natural-ish text the top candidates rarely share symbols, so
    the pass count must come in well under k (the 32 k-merge scale
    argument) while the merge list stays bit-identical."""
    from khronus_spark.operators.text import (
        bpe_merges_batched,
        bpe_merges_sequential,
    )
    from khronus_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats: dict = {}
    bat = [tuple(r) for r in bpe_merges_batched(docs, k=12, stats=stats).collect()]
    seq = [tuple(r) for r in bpe_merges_sequential(docs, k=12).collect()]
    assert bat == seq
    assert stats["passes"] <= 6, stats  # >= 2 merges per pass on average


def test_bpe_encode_token_accounting(spark):
    """Handcrafted corpus 'aaab' x3 + 'ab' x2: training learns (a,a),
    (a,b), then (aa,ab) and exhausts — 'aaab' encodes to ONE token,
    'ab' to one. Accounting: 5 words, 5 BPE tokens; k beyond the
    learnable merges must not crash the fold."""
    from khronus_spark.operators.text import bpe_encode

    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab ab ab")], "doc_id long, text string"
    )
    out = [tuple(r) for r in bpe_encode(docs, k=6).collect()]
    assert out == [(1, 5, 5)]


def test_duplicate_spans_interval_union_no_overlap(spark):
    """Duplicated gram positions 1 and 3 (gap 2 < n) cover overlapping
    token intervals [1,5] and [3,7]; they must merge into ONE span
    [1,7] — emitting both as separate overlapping spans would
    double-count tokens for any consumer cutting them."""
    from khronus_spark.operators.text import duplicate_spans

    d1 = "t1 t2 t3 t4 t5 t6 t7"
    d2 = "t1 t2 t3 t4 t5"      # duplicates d1's gram at position 1
    d3 = "t3 t4 t5 t6 t7"      # duplicates d1's gram at position 3
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    out = {}
    for r in duplicate_spans(docs, n=5, min_tokens=5).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )
    assert out[1] == [(1, 7, 7)]
    assert out[2] == [(1, 5, 5)] and out[3] == [(1, 5, 5)]


def test_c4_span_removal_keep_first_and_reassembly(spark):
    """Repeated spans survive only at their lexicographically-first
    (doc_id, span index) occurrence; clean_md5 is the md5 of the
    re-assembled surviving text."""
    import hashlib

    from khronus_spark.operators.text import c4_span_removal

    # chunk_words=3: doc 1 = [A][B], doc 2 = [B][C], doc 3 = [A]
    a, b, c = "a1 a2 a3", "b1 b2 b3", "c1 c2"
    docs = spark.createDataFrame(
        [(1, f"{a} {b}"), (2, f"{b} {c}"), (3, a)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in c4_span_removal(docs, chunk_words=3).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 1 keeps both spans (first occurrence of A and of B)
    assert (rows[1]["n_chunks"], rows[1]["n_removed"]) == (2, 0)
    assert rows[1]["clean_md5"] == md5(f"{a} {b}")
    assert rows[1]["clean_words"] == 6
    # doc 2 loses B (kept in doc 1), keeps C
    assert (rows[2]["n_chunks"], rows[2]["n_removed"]) == (2, 1)
    assert rows[2]["clean_md5"] == md5(c)
    assert rows[2]["clean_words"] == 2
    # doc 3 loses its only span (A kept in doc 1) -> empty text
    assert (rows[3]["n_chunks"], rows[3]["n_removed"]) == (1, 1)
    assert rows[3]["clean_md5"] == md5("")
    assert rows[3]["clean_words"] == 0


def test_c4_span_removal_join_is_salted(spark):
    """The keeper join must carry the structural salt (same skew
    argument as the gram joins — AQE cannot split this shape)."""
    from khronus_spark.operators.text import c4_span_removal

    docs = spark.createDataFrame(
        [(i, "w1 w2 w3 w4 w5") for i in range(6)], "doc_id long, text string"
    )
    plan = (
        c4_span_removal(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "_salt" in plan


def test_leakage_safe_split_components_share_split(spark, oracle_sf_dir):
    from khronus_spark.operators.curation import leakage_safe_split

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    out = leakage_safe_split(docs).collect()
    assert len(out) == docs.count()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component_id"], set()).add(r["split"])
    # the invariant the operator exists for: one split per component
    assert all(len(s) == 1 for s in by_comp.values())
    # multi-doc components exist in this corpus (else the test is vacuous)
    from collections import Counter

    sizes = Counter(r["component_id"] for r in out)
    assert any(n > 1 for n in sizes.values())
    # realized fractions are in the right ballpark (hash-uniform buckets)
    splits = Counter(r["split"] for r in out)
    n = len(out)
    assert 0.60 <= splits["train"] / n <= 0.95
    assert splits["test"] > 0 and splits["validation"] > 0


def test_leakage_safe_split_deterministic_under_repartition(spark):
    from khronus_spark.operators.curation import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} filler common words here") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted((r["doc_id"], r["split"]) for r in leakage_safe_split(docs).collect())
    b = sorted(
        (r["doc_id"], r["split"])
        for r in leakage_safe_split(docs.repartition(7)).collect()
    )
    assert a == b


def test_source_overlap_matrix_accounts_every_pair(spark, oracle_sf_dir):
    from khronus_spark.operators.curation import source_overlap_matrix
    from khronus_spark.operators.dedup import minhash_md5_pairs

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    m = source_overlap_matrix(docs).collect()
    assert all(r["source_a"] <= r["source_b"] for r in m)
    # every candidate pair lands in exactly one unordered cell
    assert sum(r["n_pairs"] for r in m) == minhash_md5_pairs(docs).count()
    assert all(r["n_docs_a"] > 0 for r in m)


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    from khronus_spark.operators.text import unigram_surprisal

    common = " ".join(["the"] * 20)
    docs = spark.createDataFrame(
        [(1, common), (2, common), (3, common), (4, "zq1 zq2 zq3 zq4 zq5")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    # the all-boilerplate docs score low; the all-rare doc scores high
    assert rows[4]["mean_surprisal_mbits"] > rows[1]["mean_surprisal_mbits"]
    # bit-exact floor-log2 check: N=65, 'the' count=60 -> 7-6=1 bit/token
    assert rows[1]["surprisal_bits"] == 20
    # rare tokens: count=1 -> bitlen(65)-bitlen(1) = 7-1 = 6 bits each
    assert rows[4]["surprisal_bits"] == 5 * 6
    assert rows[4]["n_tokens"] == 5


def test_unigram_surprisal_count_join_is_salted(spark):
    from khronus_spark.operators.text import unigram_surprisal

    docs = spark.createDataFrame(
        [(i, "the the quick fox") for i in range(5)], "doc_id long, text string"
    )
    plan = unigram_surprisal(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan


def test_tokenizer_fertility_consistent_with_encode_and_ranks_langs(spark):
    """The per-lang rollup must tile bpe_encode's per-doc counts, and a
    language the trained merges compress (its words ARE the top pairs)
    must show strictly lower fertility than one the vocab shreds."""
    from pyspark.sql import functions as F

    from khronus_spark.operators.text import bpe_encode, tokenizer_fertility

    rows = []
    for i in range(6):  # dominant lang: all words built from 'ab'
        rows.append((i, "abab abab ababab abab", "aa", "s", 20))
    for i in range(6, 9):  # minority lang: diverse chars, no shared pairs
        rows.append((i, "xq zw vk pj", "zz", "s", 11))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fert = {r.lang: r for r in tokenizer_fertility(docs, k=3).collect()}
    enc = bpe_encode(docs, k=3).join(docs.select("doc_id", "lang"), "doc_id")
    manual = {
        r.lang: (r.n_docs, r.n_words, r.n_bpe)
        for r in enc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_bpe"),
        )
        .collect()
    }
    for lang, r in fert.items():
        assert (r.n_docs, r.n_words, r.n_bpe_tokens) == manual[lang]
        assert r.fertility_mpt == r.n_bpe_tokens * 1000 // r.n_words
    assert fert["aa"].fertility_mpt < fert["zz"].fertility_mpt


def test_lang_confusion_matrix_tiles_and_catches_mislabels(spark):
    """Per declared language the shares must sum to ~1000 (integer
    floor), and a deliberately mislabeled doc must land off-diagonal."""
    from khronus_spark.operators.text import lang_confusion_matrix

    docs = spark.createDataFrame(
        [
            (0, "the and of the with that", "en", "s", 10),
            (1, "the and of this that with", "en", "s", 10),
            (2, "el la los las una este", "es", "s", 10),
            (3, "the and of the that", "es", "s", 10),  # mislabeled es -> en
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = lang_confusion_matrix(docs).collect()
    cells = {(r.actual_lang, r.pred_lang): r for r in rows}
    assert cells[("en", "en")].n_docs == 2
    assert cells[("es", "es")].n_docs == 1
    assert cells[("es", "en")].n_docs == 1  # the mislabel surfaces
    assert cells[("es", "en")].share_pm == 500
    for lang in ("en", "es"):
        total = sum(r.share_pm for (a, _), r in cells.items() if a == lang)
        assert 1000 - len([1 for (a, _) in cells if a == lang]) < total <= 1000


def test_source_health_report_flags_the_bad_dump(spark):
    """A mirrored (duplicate-heavy) source must show a high exact_dup_pm
    while the clean source stays at 0; counts tile per source."""
    from khronus_spark.operators.curation import source_health_report

    rows = []
    for i in range(4):  # clean source: unique texts
        rows.append((i, f"the quick brown fox number {i} jumps over dogs", "en", "clean", 40))
    for i in range(4, 10):  # mirror: one text repeated
        rows.append((i, "identical mirrored boilerplate page content here", "en", "mirror", 48))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    rep = {r.source: r for r in source_health_report(docs, top_v=3).collect()}
    assert rep["clean"].n_docs == 4 and rep["mirror"].n_docs == 6
    assert rep["clean"].exact_dup_pm == 0
    assert rep["mirror"].exact_dup_pm == 1000  # every doc is a duplicate
    for r in rep.values():
        assert 0 <= r.gopher_keep_pm <= 1000
        assert 0 <= r.oov_pm <= 1000


# ------------------------------------------------------------- BM25 retrieval


def _bm25_docs(spark, rows):
    return spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_bm25_exact_copy_ranks_first_and_k_bounds(spark):
    """A corpus doc that is an exact copy of the query must rank 1 (it
    matches every query term at full tf); output is bounded at k per
    query and ranks are dense from 1."""
    from khronus_spark.operators.text import bm25_rank

    q = "alpha beta gamma delta epsilon"
    rows = [(0, q)]  # 0 % 97 == 0 -> query
    rows += [(1, q)]  # exact copy in the corpus
    rows += [(i, f"alpha filler{i} x{i} y{i} z{i}") for i in range(2, 10)]
    got = bm25_rank(_bm25_docs(spark, rows), k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    ranked = sorted(by_q[0])
    assert [r for r, _, _ in ranked] == [1, 2, 3]  # dense, k-bounded
    assert ranked[0][1] == 1  # the exact copy wins
    assert ranked[0][2] > ranked[1][2]


def test_bm25_rare_term_outscores_common_term(spark):
    """idf discrimination: a doc matching the query's RARE term must
    outscore a doc matching only the term every corpus doc shares."""
    from khronus_spark.operators.text import bm25_rank

    rows = [(0, "common rareterm")]
    rows += [(i, f"common junk{i} pad{i}") for i in range(1, 9)]
    rows += [(9, "rareterm junk9 pad9")]
    got = {
        r.doc_id: r.score
        for r in bm25_rank(_bm25_docs(spark, rows), k=9).collect()
    }
    assert got[9] > max(v for d, v in got.items() if d != 9)


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    """b > 0 length normalization: equal tf of the query term in a
    short vs a long doc must score the short doc higher."""
    from khronus_spark.operators.text import bm25_rank

    rows = [(0, "needle")]
    rows += [(1, "needle " + " ".join(f"pad{i}" for i in range(30)))]
    rows += [(2, "needle short")]
    rows += [(i, f"other{i} stuff{i}") for i in range(3, 8)]
    got = {
        r.doc_id: r.score
        for r in bm25_rank(_bm25_docs(spark, rows), k=8).collect()
    }
    assert got[2] > got[1]


def test_bm25_decontamination_flags_planted_paraphrase(spark):
    """Retrieval decontamination: a corpus doc sharing the eval query's
    distinctive vocabulary (no exact copy required) is flagged with
    best_query_id pointing at that query; unrelated filler docs stay
    unflagged; the score_min filter drops weak tail matches."""
    from khronus_spark.operators.text import bm25_decontamination

    q = "quasar redshift spectrograph luminosity parallax"
    rows = [(0, q)]                                   # 0 % 97 == 0 -> query
    rows += [(1, "the quasar redshift spectrograph luminosity survey")]
    rows += [(i, f"mundane filler{i} text{i} about{i} nothing{i}")
             for i in range(2, 12)]
    got = {
        r.doc_id: r
        for r in bm25_decontamination(
            _bm25_docs(spark, rows), k=3, score_min=1
        ).collect()
    }
    assert 1 in got, got
    assert got[1].best_query_id == 0
    assert got[1].best_rank == 1
    assert got[1].n_queries == 1
    # with a prohibitive score_min nothing survives
    none = bm25_decontamination(_bm25_docs(spark, rows), k=3,
                                score_min=10**9).count()
    assert none == 0
    # filler docs may appear at low scores via shared stop-shape terms,
    # but never outrank the paraphrase
    for d, r in got.items():
        if d != 1:
            assert r.max_score < got[1].max_score, (d, r)


def test_bm25_query_broadcast_is_optional(spark):
    """ADVICE r5: the query-term broadcast must be a knob, not forced —
    an eval split proportional to a 100 TB corpus cannot be broadcast.
    True pins the hint in the analyzed plan; False leaves the join
    strategy to AQE (no broadcast hint anywhere)."""
    from khronus_spark.operators.text import bm25_rank

    rows = [(i, f"alpha beta w{i}") for i in range(12)]
    docs = _bm25_docs(spark, rows)
    hinted = bm25_rank(docs)._jdf.queryExecution().analyzed().toString()
    unhinted = bm25_rank(
        docs, broadcast_queries=False
    )._jdf.queryExecution().analyzed().toString()
    assert "broadcast" in hinted.lower()
    # the stats scalar still broadcasts by size; the QUERY-TERM hint is
    # the one that must disappear — count hints instead of presence
    assert hinted.lower().count("resolvedhint") > unhinted.lower().count(
        "resolvedhint"
    )


def test_winnowing_guarantee_and_density(spark):
    """The winnowing contract (Schleimer et al.): any shared token run
    of length >= w+n-1 (= 8 at n=4, w=5) between two docs yields at
    least one shared fingerprint — uniform sampling can miss such a
    match, winnowing cannot. Also: selection is far denser-bounded
    than the gram count, the rightmost-tie convention is deterministic,
    and the per-doc stage is map-only (no shuffle before the explode)."""
    from khronus_spark.operators.text import winnow_fingerprints, winnow_match_pairs

    shared = "the quick brown fox jumps over the lazy dog near the river"  # 12 tokens
    rows = [
        (1, "aaa bbb ccc " + shared + " ddd eee fff"),
        (2, "zzz yyy " + shared + " xxx www vvv uuu"),
        (3, "completely unrelated text with distinct vocabulary entirely"),
    ]
    docs = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 12-token run produced no shared fp"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: ~2/(w+1) of grams, never more than the window count
    for d, t in rows:
        n_grams = max(len(t.split()) - 3, 1)
        assert len(by_doc[d]) <= n_grams
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared_fps
        for r in winnow_match_pairs(docs, min_shared=1).collect()
    }
    assert (1, 2) in pairs and not any(3 in p for p in pairs)
    # map-only per-doc stage: no exchange below the explode
    plan = (
        winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_canonical_by_quality_keeps_best_not_first(spark):
    """The representative of a near-dup cluster must be the
    highest-quality member — not the smallest doc_id — while
    unclustered docs all survive."""
    from khronus_spark.operators.curation import canonical_by_quality

    # three near-identical docs; doc 12 is the longest/highest-quality
    base = " ".join(f"tok{j}" for j in range(30))
    rows = [
        (10, base),
        (11, base + " extra"),
        (12, base + " extra rich much longer tail of useful content here"),
        (50, "a completely different unclustered document entirely"),
    ]
    docs = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    kept = {r.doc_id for r in canonical_by_quality(docs).collect()}
    assert 50 in kept
    assert kept & {10, 11, 12} == {12}, kept  # best quality, not min id


def test_token_budget_sample_respects_budget_and_determinism(spark):
    """Kept docs' running totals stay within budget per source, at
    least one doc is dropped when a source exceeds it, and the
    selection is invariant under repartitioning (content-keyed
    order)."""
    from khronus_spark.operators.curation import token_budget_sample

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(50)), "en",
             f"src{i % 2}", 300) for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = token_budget_sample(docs, budget_tokens=500).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert max(x.cum_tokens for x in rs) <= 500
        assert len(rs) == 10  # 50 tokens/doc -> exactly 10 fit
    again = {
        (r.doc_id, r.cum_tokens)
        for r in token_budget_sample(docs.repartition(7), 500).collect()
    }
    assert again == {(r.doc_id, r.cum_tokens) for r in got}


def test_winnowing_oracle_matches_python_reference_property():
    """Property test of the winnowing SPEC (no Spark in the loop): the
    DuckDB oracle — whose hash parity with the engine the registry
    already proves — must equal a direct Python transcription of the
    Schleimer et al. selection on random token streams. Transitively
    pins engine == paper. Runs the md5_60 family exactly as both
    engines do."""
    import duckdb
    import hashlib

    from hypothesis import given, settings, strategies as st

    from khronus_spark.operators.text import winnow_fingerprints_sql

    n, w = 4, 5

    def md5_60(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    def reference(text: str) -> set[tuple[int, int]]:
        t = text.strip().lower().split()
        if len(t) >= n:
            grams = [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
        else:
            grams = [" ".join(t)]
        hs = [md5_60(g) for g in grams]
        sel = set()
        for i in range(max(len(hs) - w, 0) + 1):
            sl = hs[i : i + w]
            mn = min(sl)
            pos = i + max(j for j, v in enumerate(sl, 1) if v == mn)
            sel.add((pos, mn))
        return sel

    tokens = st.lists(
        st.sampled_from([f"t{i}" for i in range(7)]), min_size=1, max_size=30
    )

    @settings(max_examples=40, deadline=None)
    @given(tokens)
    def check(toks):
        text = " ".join(toks)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT 1::BIGINT AS doc_id, ?::VARCHAR AS text",
            [text],
        )
        got = {
            (r[1], r[2])
            for r in con.execute(winnow_fingerprints_sql(n, w)).fetchall()
        }
        assert got == reference(text), text

    check()


def test_lm_reference_surprisal_frozen_model_and_backoff(spark):
    """The reference-LM scorer: (a) a doc made of reference bigrams
    scores lower than incoherent token soup, (b) unseen-prefix bigrams
    cost the maximum (bitlen(T)+1) and are counted as OOV, (c) the
    model is FROZEN — a doc's score is identical whether scored alone
    or alongside any other batch (bigram_surprisal cannot promise
    this)."""
    from khronus_spark.operators.text import lm_model_build, lm_reference_surprisal

    def docs_of(rows):
        return spark.createDataFrame(
            [(d, t, "en", "s", len(t)) for d, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    ref = docs_of([(i, "the cat sat on the mat " * 3) for i in range(5)])
    c1, c2 = lm_model_build(ref)
    fluent = (100, "the cat sat on the mat")
    soup = (101, "zq wv xj kp qq nn")
    both = {
        r.doc_id: r
        for r in lm_reference_surprisal(docs_of([fluent, soup]), c1, c2).collect()
    }
    assert both[100].mean_surprisal_mbits < both[101].mean_surprisal_mbits
    assert both[100].oov_bigrams == 0
    assert both[101].oov_bigrams == both[101].n_bigrams  # all unseen
    t_ref = 5 * (6 * 3 - 1)  # 5 ref docs x 17 bigrams each
    assert both[101].surprisal_bits == both[101].n_bigrams * (
        t_ref.bit_length() + 1
    )  # unseen-prefix ladder rung, exactly
    alone = {
        r.doc_id: r
        for r in lm_reference_surprisal(docs_of([fluent]), c1, c2).collect()
    }
    assert alone[100].surprisal_bits == both[100].surprisal_bits  # frozen
    # short docs: 0 bigrams, NULL mean
    short = lm_reference_surprisal(docs_of([(102, "one")]), c1, c2).collect()[0]
    assert short.n_bigrams == 0 and short.mean_surprisal_mbits is None


def test_bm25_oracle_matches_python_reference_property():
    """Property test of the integer BM25 SPEC (no Spark in the loop):
    the DuckDB oracle — hash parity with the engine already proven by
    the registry — must equal a direct Python transcription of the
    floor-log2-idf + per-mille-saturation formula on random tiny
    corpora. Transitively pins engine == spec."""
    import duckdb

    from hypothesis import given, settings, strategies as st

    from khronus_spark.operators.text import bm25_rank_sql

    k1_pm, b_pm, eval_mod, k = 1200, 750, 3, 4

    def reference(rows):
        docs = {d: t.strip().lower().split() for d, t in rows}
        corpus = {d: t for d, t in docs.items() if d % eval_mod != 0}
        queries = {d: set(t) for d, t in docs.items() if d % eval_mod == 0}
        tf = {(d, w): docs[d].count(w) for d in corpus for w in set(docs[d])}
        dl = {d: len(corpus[d]) for d in corpus}
        if not corpus:
            return set()
        df = {}
        for (d, w) in tf:
            df[w] = df.get(w, 0) + 1
        n_docs = len(corpus)
        avgdl_m = sum(dl.values()) * 1000 // n_docs
        out = []
        for q, qws in queries.items():
            scores = {}
            for d in corpus:
                s = 0
                for w in qws:
                    t = tf.get((d, w))
                    if not t:
                        continue
                    idf = (n_docs // df[w]).bit_length()
                    denom = 1000 * t + k1_pm * (
                        1000 - b_pm + b_pm * 1000 * dl[d] // avgdl_m
                    ) // 1000
                    s += idf * (1000 * (1000 + k1_pm) * t // denom)
                if s:
                    scores[d] = s
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            for rank, (d, s) in enumerate(ranked, 1):
                out.append((q, d, s, rank))
        return set(out)

    word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)
    corpus = st.lists(doc, min_size=2, max_size=8)

    @settings(max_examples=25, deadline=None)
    @given(corpus)
    def check(texts):
        rows = list(enumerate(texts))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
        )
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        got = set(
            map(tuple, con.execute(bm25_rank_sql(eval_mod, k)).fetchall())
        )
        assert got == reference(rows), rows

    check()


def test_intra_doc_repetition_flags_templates(spark):
    """A doc that is one phrase repeated must fail the within-doc
    rules; normal prose passes; short docs pass vacuously."""
    from khronus_spark.operators.text import intra_doc_repetition

    rows = [
        (1, "click here to continue " * 8),          # template loop
        (2, "each word here appears exactly once in this sentence"),
        (3, "ok"),                                    # too short for grams
    ]
    docs = spark.createDataFrame(
        [(d, t.strip(), "en", "s", len(t)) for d, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in intra_doc_repetition(docs).collect()}
    assert not got[1].r_rep and got[1].dup2_bp > 8000
    assert got[2].r_rep and got[2].dup2_bp == 0
    assert got[3].r_rep and got[3].n_grams2 == 0


def test_length_bucketed_batches_bounded_and_deterministic(spark):
    """Batches respect the token budget (start offset < budget), group
    only docs of one length class, and the assignment is invariant
    under repartitioning."""
    from khronus_spark.operators.curation import length_bucketed_batches

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(4 + (i % 3) * 40)), "en",
             "s", 100) for i in range(60)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = length_bucketed_batches(docs, batch_tokens=100).collect()
    assert {r.doc_id for r in got} == set(range(60))  # nothing dropped
    groups = {}
    for r in got:
        groups.setdefault((r.len_bucket, r.shard, r.batch_id), []).append(r)
    for key, rs in groups.items():
        assert len({r.len_bucket for r in rs}) == 1
        # greedy start-offset rule: every member STARTED inside the
        # budget window of its batch
        total = sum(r.n_tokens for r in rs)
        assert total - max(r.n_tokens for r in rs) < 100
    again = {(r.doc_id, r.len_bucket, r.shard, r.batch_id)
             for r in length_bucketed_batches(docs.repartition(7), 100).collect()}
    assert again == {(r.doc_id, r.len_bucket, r.shard, r.batch_id) for r in got}


def test_chunking_covers_reassembles_and_overlaps(spark):
    """Chunking contract: (a) every token position of every doc is
    covered by some chunk (the tail is never dropped), (b) chunks
    reassemble the document exactly via their stride prefixes,
    (c) consecutive chunks overlap by chunk-stride, (d) short docs
    yield exactly one whole-doc chunk, (e) bad params raise."""
    import pytest as _pytest

    from khronus_spark.operators.text import chunk_documents

    texts = {
        1: " ".join(f"w{j}" for j in range(150)),  # multi-chunk
        2: " ".join(f"v{j}" for j in range(64)),   # exactly one window
        3: "a b c",                                 # short
        4: " ".join(f"u{j}" for j in range(65)),   # one past the window
    }
    docs = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = chunk_documents(docs, 64, 48).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, t in texts.items():
        toks = t.split()
        rs = sorted(by_doc[d], key=lambda r: r.chunk_id)
        assert rs[0].start_tok == 1 and rs[-1].end_tok == len(toks)  # coverage
        for r in rs:
            assert r.chunk_text == " ".join(toks[r.start_tok - 1 : r.end_tok])
        for a, b in zip(rs, rs[1:]):
            assert b.start_tok - a.start_tok == 48  # stride
            assert a.end_tok >= b.start_tok - 1     # no gap
        # reassembly from stride prefixes + last chunk
        rebuilt = []
        for r in rs[:-1]:
            rebuilt.extend(toks[r.start_tok - 1 : r.start_tok - 1 + 48])
        rebuilt.extend(toks[rs[-1].start_tok - 1 : rs[-1].end_tok])
        assert rebuilt == toks, d
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 1
    assert len(by_doc[4]) == 2  # token 65 only reachable via a 2nd chunk
    with _pytest.raises(ValueError):
        chunk_documents(docs, 10, 20)


def test_hard_negatives_exclude_dup_component_transitively(spark):
    """An anchor's exact duplicate AND the duplicate's own duplicate
    (whose direct cosine to the anchor may dip below the pairwise
    threshold) are both excluded; the nearest non-duplicate surfaces
    as rank 1."""
    import math

    from khronus_spark.operators.similarity import hard_negative_pairs

    def unit(theta):
        # 2D rotation embedded in 64 dims: controlled cosines
        v = [0.0] * 64
        v[0], v[1] = math.cos(theta), math.sin(theta)
        return v

    rows = [
        (0, unit(0.0)),      # anchor
        (1, unit(0.0)),      # exact dup of anchor (cos 1.0)
        (2, unit(0.12)),     # dup of 1? cos(0.12)≈0.9928 -> dup edge to 0 and 1
        (3, unit(0.6)),      # cos≈0.825 -> the true hard negative
        (4, unit(2.0)),      # far away
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {}
    # toy-corpus LSH sizing: 8 single-bit bands give every pair a ~1/2
    # collision chance per band, so all 5 vectors are mutual candidates
    # (the registry's fine default buckets would leave a 5-vector
    # corpus all-singleton now that the planes are genuinely
    # independent — this test is about exclusion semantics, not recall)
    out = hard_negative_pairs(
        emb, k=2, dup_threshold_bp=9900, n_bands=8, planes_per_band=1
    )
    for r in out.collect():
        got.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id, r.cosine_bp))
    anchor = sorted(got.get(0, []))
    neighbors = [n for _, n, _ in anchor]
    assert 1 not in neighbors and 2 not in neighbors, anchor  # component out
    assert neighbors and neighbors[0] == 3, anchor            # hard negative first


def test_mixture_realization_moves_shares_toward_targets(spark):
    """On a skewed two-language corpus: the head language downsamples
    (keep rate < 10000), the tail language keeps everything (rate
    10000 by normalization), and the realized share of the tail lands
    STRICTLY closer to its tempered target than its natural share was;
    kept_tokens tallies only kept docs; determinism under
    repartition."""
    from khronus_spark.operators.curation import (
        domain_mixture,
        mixture_realization_audit,
    )

    rows = [(i, " ".join(f"e{i}w{j}" for j in range(40)), "en", "s", 100)
            for i in range(180)]
    rows += [(1000 + i, " ".join(f"f{i}w{j}" for j in range(40)), "fr", "s", 100)
             for i in range(20)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    mix = {r.lang: r for r in domain_mixture(docs).collect()}
    got = {r.lang: r for r in mixture_realization_audit(docs).collect()}
    assert got["fr"].keep_rate_bp == 10000      # most-upweighted keeps all
    assert got["en"].keep_rate_bp < 10000       # head downsampled
    nat_fr = mix["fr"].natural_bp
    tgt_fr = mix["fr"].tempered_bp
    assert abs(got["fr"].realized_bp - tgt_fr) < abs(nat_fr - tgt_fr)
    assert got["fr"].dev_bp == got["fr"].realized_bp - tgt_fr
    again = {(r.lang, r.kept_tokens, r.realized_bp)
             for r in mixture_realization_audit(docs.repartition(5)).collect()}
    assert again == {(r.lang, r.kept_tokens, r.realized_bp) for r in got.values()}


def test_corpus_diff_statuses_match_carve_algebra(spark, sf_dir):
    """The diff's three status sets must equal the set algebra of the
    version carves: added = new \\ old, removed = old \\ new, changed =
    (old ∩ new) with edited text — and no unchanged row may appear."""
    import __spark_entry__ as E

    out = E.queries()["corpus_version_diff"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = [r[0] for r in docs.select("doc_id").collect()]
    old = {i for i in ids if i % 7 != 3}
    new = {i for i in ids if i % 5 != 0}
    edited = {i for i in new if i % 11 == 0}
    by_status = {}
    for r in out:
        by_status.setdefault(r["status"], set()).add(r["doc_id"])
    assert by_status.get("added", set()) == new - old
    assert by_status.get("removed", set()) == old - new
    assert by_status.get("changed", set()) == (old & new) & edited
    assert set(by_status) <= {"added", "removed", "changed"}


def test_normalize_text_semantics(spark):
    """Control chars become spaces, runs collapse, ends trim; `changed`
    flags exactly the docs the pass altered."""
    from khronus_spark.operators.text import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "a\tb\x00c"),
            (2, "  spaced   out  "),
            (3, "already clean"),
            (4, "line1\nline2\r\nline3"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert out[1]["text_norm"] == "a b c" and out[1]["changed"]
    assert out[2]["text_norm"] == "spaced out" and out[2]["changed"]
    assert out[3]["text_norm"] == "already clean" and not out[3]["changed"]
    assert out[4]["text_norm"] == "line1 line2 line3" and out[4]["changed"]
    for r in out.values():
        assert r["n_chars_norm"] == len(r["text_norm"])


def test_skew_profile_planted_hot_key(spark):
    """A planted 50%-hot key reads share_bp=5000, rank 1, and a
    mean-multiple of ~n_keys/2 x 100; cumulative shares tile to
    10000 over the full key set."""
    from khronus_spark.operators.skew import skew_profile

    rows = [(0, i) for i in range(50)]  # hot key: 50 of 100 rows
    rows += [(k, 0) for k in range(1, 51)]  # 50 singleton keys
    df = spark.createDataFrame(rows, "user_id long, x long")
    out = {r["rank"]: r for r in skew_profile(df, "user_id", top_n=60).collect()}
    assert out[1]["key"] == 0 and out[1]["cnt"] == 50
    assert out[1]["share_bp"] == 5000
    # mean key count = 100 div 51 = 1 -> hot key is 50x the mean
    assert out[1]["mean_mult_x100"] == 5000
    # deterministic ties: singletons rank by key asc
    assert out[2]["key"] == 1 and out[2]["cnt"] == 1
    assert out[len(out)]["cum_share_bp"] == 10000  # tiles exactly


def test_leakage_safe_kfold_component_purity(spark, oracle_sf_dir):
    """Every near-dup component lands in exactly ONE fold (the
    leakage-safety invariant for every fold-as-holdout rotation);
    folds cover [0, k); every doc is assigned exactly once; and the
    fold channel is independent of the split entry's buckets (not a
    nesting)."""
    from khronus_spark.operators.curation import (
        leakage_safe_kfold,
        leakage_safe_split,
    )
    from khronus_spark.sources.tables import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    out = leakage_safe_kfold(docs, k=5).collect()
    assert len(out) == docs.count()
    assert {r["fold"] for r in out} <= set(range(5))
    by_comp: dict = {}
    for r in out:
        by_comp.setdefault(r["component_id"], set()).add(r["fold"])
    assert all(len(folds) == 1 for folds in by_comp.values())
    # at least one real multi-doc component exercises the invariant
    sizes: dict = {}
    for r in out:
        sizes[r["component_id"]] = sizes.get(r["component_id"], 0) + 1
    assert max(sizes.values()) >= 2
    # fresh hash channel: fold is NOT a function of the split bucket
    buckets = {
        r["doc_id"]: r["bucket"] for r in leakage_safe_split(docs).collect()
    }
    pairs = {(buckets[r["doc_id"]], r["fold"]) for r in out}
    assert len(pairs) > 5 * 2  # many (bucket % k, fold) combinations


def test_dedup_exact_docs_entry_is_not_vacuous(spark, oracle_sf_dir):
    """r10 verdict What's-wrong #2: the dedup_exact_docs driver row was
    0 == 0 in every round (the testdata has no byte-identical texts) —
    the hash proved only that both engines return the empty set. The
    re-pointed entry plants the five lowest doc_ids under ids +10^9;
    the result must be exactly those five groups, each keeping the
    ORIGINAL id — so the driver hash now proves grouping, counting,
    and survivor choice."""
    from khronus_spark.entry_queries import queries

    rows = queries()["dedup_exact_docs"](spark, oracle_sf_dir).collect()
    assert len(rows) == 5
    assert all(r.n_docs == 2 for r in rows)
    assert sorted(r.keep_doc_id for r in rows) == [0, 1, 2, 3, 4]
