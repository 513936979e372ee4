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
