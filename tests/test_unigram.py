"""Unigram-LM Viterbi segmentation: the divergence-from-greedy fixture
(the reason this face exists), hand-checkable scoring, and a
hypothesis property test against an independent pure-Python Viterbi."""

from __future__ import annotations

from khronus_spark.operators.text import (
    unigram_encode,
    wordpiece_encode,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_viterbi_beats_greedy_where_they_diverge(spark):
    """Vocab freqs: ab=8(bitlen 4), abc=2(bitlen 2), c=8(4), a=1, b=1;
    F=20 so every piece pays bitlen(20)=5. For 'abc':
      greedy longest-match: 'abc'            -> 1 piece, score 2-5 = -3
      Viterbi:              'ab'+'c'         -> 2 pieces, (4-5)+(4-5) = -2
    Viterbi must pick the higher-likelihood two-piece split; greedy
    WordPiece over the same pieces takes the one-piece prefix."""
    docs = _docs(spark, [(1, "abc")])
    uv = spark.createDataFrame(
        [("ab", 8), ("abc", 2), ("c", 8), ("a", 1), ("b", 1)],
        "piece string, freq long",
    )
    row = unigram_encode(docs, vocab=uv).first()
    assert (row.n_unigram_tokens, row.n_unk_words, row.total_score) == (
        2, 0, -2,
    )
    # same pieces as a WordPiece set-vocab: greedy takes 'abc' whole
    wv = spark.createDataFrame(
        [("ab", True), ("abc", True), ("c", False), ("a", True),
         ("b", False), ("c", True)],
        "piece string, is_initial boolean",
    )
    assert wordpiece_encode(docs, vocab=wv).first().n_wp_tokens == 1


def test_unigram_tie_breaks_to_fewer_pieces(spark):
    """Equal-likelihood segmentations must resolve to FEWER pieces.
    Freqs: ab=2 (bitlen 2), a=5 (bitlen 3), b=5 (bitlen 3); F=12
    (bitlen 4). 'ab' as one piece scores 2-4 = -2; as 'a'+'b' scores
    (3-4)+(3-4) = -2 — an exact tie, so the (score, -n) comparison
    must pick the single piece."""
    uv = spark.createDataFrame(
        [("ab", 2), ("a", 5), ("b", 5)],
        "piece string, freq long",
    )
    row = unigram_encode(_docs(spark, [(1, "ab")]), vocab=uv).first()
    assert (row.n_unigram_tokens, row.total_score) == (1, -2)


def test_unigram_max_piece_len_one_analyzes(spark):
    """r11 review fix: max_piece_len=1 used to hand greatest() a single
    candidate struct and fail analysis (greatest requires >= 2 args);
    the trailing typed-NULL candidate keeps the plan well-formed.
    Char-vocab scoring: a=3,b=1; F=4 -> C=3; 'ab' = (2-3)+(1-3) = -3."""
    uv = spark.createDataFrame(
        [("a", 3), ("b", 1)], "piece string, freq long"
    )
    row = unigram_encode(
        _docs(spark, [(1, "ab")]), vocab=uv, max_piece_len=1
    ).first()
    assert (row.n_unigram_tokens, row.n_unk_words, row.total_score) == (
        2, 0, -3,
    )


def test_unigram_unk_and_overlong(spark):
    uv = spark.createDataFrame([("a", 3)], "piece string, freq long")
    # F=3 -> C=2; 'aa' segments (2 pieces, (2-2)*2=0); 'ax' has no
    # cover for 'x' -> UNK score -4; 21-char word -> overlong UNK
    docs = _docs(spark, [(1, "aa ax " + "a" * 21)])
    row = unigram_encode(docs, vocab=uv).first()
    assert (row.n_words, row.n_unigram_tokens, row.n_unk_words,
            row.total_score) == (3, 4, 2, -8)


def test_unigram_oracle_matches_python_reference_property():
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from khronus_spark.operators.text import unigram_encode_sql

    sql = unigram_encode_sql(n_multi=10)

    def _py_reference(docs, max_piece=4, n_multi=10, max_word=16):
        from collections import Counter

        wcnt = Counter()
        for _, text in docs:
            for w in text.strip().lower().split():
                if w:
                    wcnt[w] += 1
        pfreq = Counter()
        for w, c in wcnt.items():
            if len(w) > max_word:
                continue
            for p in range(len(w)):
                for L in range(1, min(max_piece, len(w) - p) + 1):
                    pfreq[w[p : p + L]] += c
        chars = {k: v for k, v in pfreq.items() if len(k) == 1}
        multi = dict(
            sorted(
                ((k, v) for k, v in pfreq.items() if len(k) >= 2),
                key=lambda kv: (-kv[1], kv[0]),
            )[:n_multi]
        )
        vocab = {**chars, **multi}
        C = (sum(vocab.values())).bit_length()
        sc = {k: v.bit_length() - C for k, v in vocab.items()}

        def encode(w):
            if len(w) > max_word:
                return 1, True, -2 * C
            dp = [None] * (len(w) + 1)
            dp[0] = (0, 0)  # (score, -n)
            for i in range(1, len(w) + 1):
                best = None
                for L in range(1, min(max_piece, i) + 1):
                    piece = w[i - L : i]
                    if dp[i - L] is not None and piece in sc:
                        cand = (dp[i - L][0] + sc[piece], dp[i - L][1] - 1)
                        if best is None or cand > best:
                            best = cand
                dp[i] = best
            if dp[len(w)] is None:
                return 1, True, -2 * C
            s, negn = dp[len(w)]
            return -negn, False, s

        out = {}
        for doc_id, text in docs:
            words = [w for w in text.strip().lower().split() if w]
            if not words:
                continue
            toks = unks = score = 0
            for w in words:
                n, unk, s = encode(w)
                toks += n
                unks += unk
                score += s
            out[doc_id] = (len(words), toks, unks, score)
        return out

    word = st.text(alphabet="abcz", min_size=1, max_size=20)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def run(texts):
        docs = list(enumerate(texts))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
        got = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(sql).fetchall()
        }
        con.close()
        assert got == _py_reference(docs)

    run()


def test_unigram_max_piece_len_beyond_eight(spark):
    """r10 review fix: the score-map key stride follows max_piece_len
    (pos*stride + L), so piece caps past the old hard-coded 8 neither
    collide keys nor mis-route DP scores. One 10-char piece must win
    whole against its per-char decomposition."""
    docs = _docs(spark, [(1, "abcdefghij")])
    uv = spark.createDataFrame(
        [("abcdefghij", 100)]
        + [(c, 1) for c in "abcdefghij"],
        "piece string, freq long",
    )
    row = unigram_encode(docs, vocab=uv, max_piece_len=10).first()
    assert (row.n_unigram_tokens, row.n_unk_words) == (1, 0)
