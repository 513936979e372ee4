"""WordPiece greedy longest-match encoding: hand-checkable fixtures
against a handcrafted vocab (the algorithm contract, independent of
the corpus-derived vocab the oracle-backed entry uses)."""

from __future__ import annotations

from khronus_spark.operators.text import wordpiece_encode, wordpiece_vocab


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hand_vocab(spark):
    # initial pieces: hell, un, w; continuations: o, orld, anted, ly
    return spark.createDataFrame(
        [
            ("hell", True),
            ("un", True),
            ("w", True),
            ("o", False),
            ("orld", False),
            ("anted", False),
            ("ly", False),
        ],
        "piece string, is_initial boolean",
    )


def test_wordpiece_greedy_longest_match_hand_fixture(spark):
    """hello = hell+o (2); world = w+orld (2); worldly = w+orld+ly (3);
    unwanted = un, then no continuation matches 'w…' -> whole word UNK
    (1 token) — greedy, not backtracking: 'anted' IS in the vocab but
    greedy consumed 'un' and dies at 'w', exactly BERT's behavior."""
    docs = _docs(spark, [(1, "hello world unwanted worldly")])
    row = wordpiece_encode(docs, vocab=_hand_vocab(spark)).first()
    assert (row.n_words, row.n_wp_tokens, row.n_unk_words) == (4, 8, 1)


def test_wordpiece_longest_wins_over_first(spark):
    """Both 'w' and a longer initial piece match: longest must win."""
    docs = _docs(spark, [(1, "worldly")])
    vocab = spark.createDataFrame(
        [("w", True), ("world", True), ("ly", False), ("orld", False)],
        "piece string, is_initial boolean",
    )
    # greedy takes 'world' (5) not 'w'+'orld', then 'ly' -> 2 tokens
    row = wordpiece_encode(docs, vocab=vocab, max_piece_len=5).first()
    assert (row.n_wp_tokens, row.n_unk_words) == (2, 0)


def test_wordpiece_overlong_word_is_unk(spark):
    docs = _docs(spark, [(1, "supercalifragilisticexpialidocious ok")])
    vocab = spark.createDataFrame(
        [("o", True), ("k", False), ("s", True)],
        "piece string, is_initial boolean",
    )
    row = wordpiece_encode(docs, vocab=vocab).first()
    # 'ok' = o+k (2); the 34-char word exceeds max_word_len -> UNK
    assert (row.n_words, row.n_wp_tokens, row.n_unk_words) == (2, 3, 1)


def test_wordpiece_corpus_vocab_covers_short_words(spark):
    """With the corpus-derived vocab, every per-role character is in
    the vocab, so the only UNKs are overlong words."""
    docs = _docs(
        spark,
        [(1, "abc abc xyz qq"), (2, "a" * 20 + " abc")],
    )
    vocab = wordpiece_vocab(docs)
    out = {r.doc_id: r for r in wordpiece_encode(docs, vocab=vocab).collect()}
    assert out[1].n_unk_words == 0
    assert out[2].n_unk_words == 1  # only the 20-char word


# ------------------- the BERT contract, property-tested (hypothesis)
# An INDEPENDENT pure-Python reference of frequency-induced-vocab +
# greedy longest-match encoding, compared against the committed DuckDB
# oracle on random corpora. The oracle is hash-compared against the
# Spark plan at sf0.01 by test_oracle_parity, so this transitively
# property-tests the Spark operator without a Spark session per
# example.


def _py_reference(docs, max_piece=4, n_multi=200, max_word=16):
    from collections import Counter

    wcnt = Counter()
    for _, text in docs:
        for w in text.strip().lower().split():
            if w:
                wcnt[w] += 1
    subs = Counter()
    chars = set()
    for w, c in wcnt.items():
        if len(w) > max_word:
            continue
        for p in range(len(w)):
            for L in range(1, min(max_piece, len(w) - p) + 1):
                piece, ini = w[p : p + L], p == 0
                if L == 1:
                    chars.add((piece, ini))
                else:
                    subs[(piece, ini)] += c
    multi = sorted(
        subs.items(), key=lambda kv: (-kv[1], not kv[0][1], kv[0][0])
    )[:n_multi]
    vocab = chars | {k for k, _ in multi}

    def encode(w):
        if len(w) > max_word:
            return 1, True
        pos, n = 0, 0
        while pos < len(w):
            for L in range(min(max_piece, len(w) - pos), 0, -1):
                if (w[pos : pos + L], pos == 0) in vocab:
                    pos += L
                    n += 1
                    break
            else:
                return 1, True
        return n, False

    out = {}
    for doc_id, text in docs:
        words = [w for w in text.strip().lower().split() if w]
        if not words:
            continue
        n_words = len(words)
        toks = unks = 0
        for w in words:
            n, unk = encode(w)
            toks += n
            unks += unk
        out[doc_id] = (n_words, toks, unks)
    return out


def test_wordpiece_oracle_matches_python_reference_property():
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from khronus_spark.operators.text import wordpiece_encode_sql

    sql = wordpiece_encode_sql(n_multi=12)  # small vocab: forces UNKs

    word = st.text(alphabet="abcz", min_size=1, max_size=20)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def run(texts):
        docs = list(enumerate(texts))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
        )
        con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
        got = {
            r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()
        }
        con.close()
        assert got == _py_reference(docs, n_multi=12)

    run()
