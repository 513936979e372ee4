"""PQ geometry parameterization (r10 verdict directive 3): the
subvector slicing was hard-wired to DIMS=64 — surfaced by the round-10
drift exploration's dim-16 corpus. Every build/encode/query face must
run at dims 16 AND 64, indivisible combinations must fail loudly at
build time, and the dim-16 oracle restatement must agree value-for-
value with the Spark side (the same DuckDB parity discipline as the
64-dim registry entries)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from khronus_spark.operators import pq as pq_ops
from khronus_spark.operators.similarity import anisotropic_corpus


@pytest.fixture(scope="module")
def emb16(spark, tmp_path_factory):
    """The drift exploration's corpus shape at dim=16, materialized
    through parquet so self-joins don't share generator lineage."""
    path = str(tmp_path_factory.mktemp("pq16") / "emb16")
    anisotropic_corpus(spark, 300, dim=16).write.parquet(path)
    return spark.read.parquet(path)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_invalid_geometry_fails_at_build_time(emb16):
    with pytest.raises(ValueError, match="dims=16 .*sub=5"):
        pq_ops.pq_codes(emb16, sub=5, k=8, iters=1, dims=16)
    with pytest.raises(ValueError, match="positive multiple"):
        pq_ops.pq_codes_sql(sub=7, k=8, iters=1, dims=16)
    with pytest.raises(ValueError, match="positive multiple"):
        pq_ops.ivf_pq_build_index(emb16, sub=3, k=8, iters=1, dims=16)


def test_ivf_pq_build_encode_query_dim16(spark, emb16, tmp_path):
    """The full indexed arc at dims=16/sub=4: build == inline (the
    split must not change a value), incremental encode == rebuild over
    the union, and the rerank face agrees with its inline twin."""
    base = emb16.where("vec_id < 250")
    kw = dict(sub=4, k=8, iters=1, dims=16)

    books, coded, cents = pq_ops.ivf_pq_build_index(base, stride=50, **kw)
    path = str(tmp_path / "idx16")
    pq_ops.write_ivf_pq_index(books, coded, cents, path)
    books, coded, cents = pq_ops.read_ivf_pq_index(spark, path)

    # incremental add: copies of build-time vectors under fresh ids
    # must carry the SAME (pq_code, centroid_id) as their originals
    # (the test_projection 64-dim pin, at dims=16)
    newcomers = base.where("vec_id < 6").select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding"
    )
    built = {r.vec_id: (r.pq_code, r.centroid_id) for r in coded.collect()}
    added = {
        r.vec_id: (r.pq_code, r.centroid_id)
        for r in pq_ops.ivf_pq_encode(
            newcomers, books, cents, sub=4, k=8, dims=16
        ).collect()
    }
    for v in range(6):
        assert added[9000 + v] == built[v], v

    # indexed query == inline query (index trained on the full corpus)
    books_f, coded_f, cents_f = pq_ops.ivf_pq_build_index(
        emb16, stride=50, **kw
    )
    probes = [3, 77, 141]
    pv = emb16.where(F.col("vec_id").isin(probes)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = pq_ops.ivf_pq_topk_indexed(
        books_f, coded_f, cents_f, pv, 3, nprobe=2, sub=4, k=8, dims=16
    )
    want = pq_ops.ivf_pq_topk(
        emb16, probes, 3, stride=50, nprobe=2, sub=4, k=8, iters=1, dims=16
    )
    assert _rows(got) == _rows(want) and got.count() > 0

    # and the full production composition (rerank) agrees too
    got_rr = pq_ops.ivf_pq_rerank_topk_indexed(
        books_f, coded_f, cents_f, pv, emb16, 3, 10, nprobe=2,
        sub=4, k=8, dims=16,
    )
    want_rr = pq_ops.ivf_pq_rerank_topk(
        emb16, probes, 3, 10, stride=50, nprobe=2, sub=4, k=8, iters=1,
        dims=16,
    )
    assert _rows(got_rr) == _rows(want_rr) and got_rr.count() > 0


def test_pq_encode_fused_matches_pq_encode_dim16(spark, emb16):
    books = pq_ops.pq_codebooks(emb16, sub=4, k=8, iters=1, dims=16)
    a = pq_ops.pq_encode(emb16, books, sub=4, k=8, dims=16)
    b = pq_ops.pq_encode_fused(emb16, books, sub=4, k=8, dims=16)
    assert _rows(a) == _rows(b)


def test_dim16_oracle_parity_codes_and_topk(spark, emb16, tmp_path):
    """DuckDB parity at dims=16 — the same gate the 64-dim registry
    entries pass: codes and ADC top-k value-identical across engines."""
    pdf = emb16.toPandas()
    con = duckdb.connect()
    con.register("embeddings", pdf)

    got = _rows(pq_ops.pq_codes(emb16, sub=4, k=8, iters=1, dims=16))
    want = sorted(
        map(tuple, con.execute(
            pq_ops.pq_codes_sql(sub=4, k=8, iters=1, dims=16)
        ).fetchall())
    )
    assert got == want and len(got) == 300

    probes = [0, 9, 42]
    got_tk = _rows(
        pq_ops.pq_topk(emb16, probes, 3, sub=4, k=8, iters=1, dims=16)
    )
    want_tk = sorted(
        map(tuple, con.execute(
            pq_ops.pq_topk_sql(probes, 3, sub=4, k=8, iters=1, dims=16)
        ).fetchall())
    )
    assert got_tk == want_tk and len(got_tk) == 9


def test_dim64_defaults_untouched(spark, sf_dir):
    """The parameterization must not move a single default-geometry
    value: pq_codes with and without an explicit dims=64 are
    row-identical on the real embeddings table."""
    from khronus_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").where("vec_id < 120")
    a = _rows(pq_ops.pq_codes(emb, sub=4, k=8, iters=1))
    b = _rows(pq_ops.pq_codes(emb, sub=4, k=8, iters=1, dims=64))
    assert a == b


def test_matryoshka_degenerates_to_pq_rerank_at_full_prefix(spark, emb16):
    """prefix_dims == dims makes the Matryoshka composition exactly
    pq_rerank_topk (same shortlist metric, same rerank width) — the
    degenerate-equality pin that anchors the two-width semantics."""
    probes = [0, 9, 42]
    a = _rows(
        pq_ops.matryoshka_rerank_topk(
            emb16, probes, 3, n_candidates=10, prefix_dims=16,
            sub=4, k=8, iters=1, dims=16,
        )
    )
    b = _rows(
        pq_ops.pq_rerank_topk(
            emb16, probes, 3, n_candidates=10, sub=4, k=8, iters=1, dims=16
        )
    )
    assert a == b and len(a) == 9


def test_matryoshka_shortlist_is_prefix_metric_rerank_full_width(
    spark, sf_dir
):
    """On the real 64-wide embeddings, the prefix-16 shortlist must
    (a) produce full-width EXACT distances in the output and (b)
    differ from the full-width ADC shortlist composition in general —
    if the two agreed row-for-row the prefix stage would not be
    exercising its own metric (the corpus is random, so prefix and
    full orderings disagree somewhere in 5 probes x 30 candidates)."""
    from khronus_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").where("vec_id < 200")
    probes = [0, 1, 2, 3, 4]
    mat = pq_ops.matryoshka_rerank_topk(
        emb, probes, 3, n_candidates=10, prefix_dims=16, sub=4, k=8, iters=1
    )
    rows = mat.collect()
    assert len(rows) == 15
    full = _rows(
        pq_ops.pq_rerank_topk(
            emb, probes, 3, n_candidates=10, sub=4, k=8, iters=1
        )
    )
    # d2 values that DO appear must be exact full-width distances:
    # any (probe, neighbor) pair present in both compositions carries
    # the identical exact distance (the rerank metric is shared)
    fd = {(p, n): d for p, n, d in full}
    shared = [r for r in rows if (r.probe_id, r.neighbor_id) in fd]
    assert shared, "compositions should overlap on some exact neighbors"
    for r in shared:
        assert fd[(r.probe_id, r.neighbor_id)] == r.d2


def test_matryoshka_indexed_matches_inline(spark, sf_dir, tmp_path):
    """The Matryoshka build/query split must not change a value: the
    prefix index built once + queried (no training in the plan) equals
    the inline composition on the real 64-wide table."""
    from khronus_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").where("vec_id < 200")
    prefix = emb.select(
        "vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding")
    )
    books, codes = pq_ops.pq_build_index(
        prefix, sub=4, k=8, iters=1, dims=16
    )
    path = str(tmp_path / "mat16")
    pq_ops.write_pq_index(books, codes, path)
    books, codes = pq_ops.read_pq_index(spark, path)
    probes = [0, 1, 2, 3, 4]
    pv = emb.where(F.col("vec_id").isin(probes)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = pq_ops.matryoshka_rerank_topk_indexed(
        books, codes, pv, emb, 3, n_candidates=10, prefix_dims=16,
        sub=4, k=8,
    )
    want = pq_ops.matryoshka_rerank_topk(
        emb, probes, 3, n_candidates=10, prefix_dims=16, sub=4, k=8,
        iters=1,
    )
    assert _rows(got) == _rows(want) and got.count() == 15


def test_matryoshka_prefix_must_nest_inside_dims(spark, emb16):
    """r11 self-review: slice() clamps silently, so an oversized
    prefix would quantize empty upper subspaces into constant codes
    (an id-lottery shortlist) — the misuse must fail at call time."""
    with pytest.raises(ValueError, match="prefix_dims=32 exceeds dims=16"):
        pq_ops.matryoshka_rerank_topk(
            emb16, [0], 3, prefix_dims=32, sub=4, k=8, iters=1, dims=16
        )
    with pytest.raises(ValueError, match="exceeds dims"):
        pq_ops.matryoshka_rerank_topk_sql(
            [0], 3, prefix_dims=128, sub=4, k=8, iters=1
        )


def test_matryoshka_indexed_rejects_oversized_prefix(spark, emb16, tmp_path):
    """r12 ADVICE: the indexed twin used to skip the nesting check its
    inline twin raises on — an oversized prefix_dims silently clamped
    at slice() and the ADC shortlist degraded to an id-lottery. The
    probe frame itself is the width source of truth."""
    prefix = emb16.select(
        "vec_id", F.expr("slice(embedding, 1, 8)").alias("embedding")
    )
    books, codes = pq_ops.pq_build_index(prefix, sub=4, k=8, iters=1, dims=8)
    pv = emb16.where("vec_id < 3").select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    with pytest.raises(ValueError, match="prefix_dims=32 exceeds the probe"):
        pq_ops.matryoshka_rerank_topk_indexed(
            books, codes, pv, emb16, 3, prefix_dims=32, sub=4, k=8
        ).collect()
    # the nested geometry still runs (probe width 16 >= prefix 8)
    ok = pq_ops.matryoshka_rerank_topk_indexed(
        books, codes, pv, emb16, 3, n_candidates=10, prefix_dims=8,
        sub=4, k=8,
    )
    assert ok.count() == 9


@pytest.fixture(scope="module")
def sweep_corpora(spark, tmp_path_factory):
    """The r11 matryoshka-sweep pair: the realistic filament corpus
    (signal hash-spread across dims) and the adversarial tail-only
    corpus (first 32 dims a function of the 60-vector GROUP alone;
    neighbors defined in dims 33-64) — scripts/matryoshka_sweep.py's
    exact constructions."""
    root = tmp_path_factory.mktemp("mrl_sweep")
    n = 600
    anisotropic_corpus(spark, n, dim=64).write.parquet(f"{root}/iso")
    tail_expr = """
    transform(sequence(0, 63), d -> CAST(
      CASE WHEN d < 32
        THEN (pmod(xxhash64(vec_id div 60, d, 101), 2000001)
              / 1000000.0D) - 1.0D
        ELSE least(1.0D, greatest(-1.0D,
          (pmod(xxhash64(vec_id div 60, pmod(vec_id, 10), d, 202),
                1800001) / 1000000.0D) - 0.9D
          + (pmod(xxhash64(vec_id, d, 303), 21) - 10) / 1000.0D))
      END AS FLOAT))
    """
    spark.range(n).select(
        F.col("id").alias("vec_id"), F.expr(tail_expr).alias("embedding")
    ).write.parquet(f"{root}/tail")
    return (
        spark.read.parquet(f"{root}/iso"),
        spark.read.parquet(f"{root}/tail"),
    )


def test_matryoshka_probe_pins_the_sweep_numbers(spark, sweep_corpora):
    """r11 verdict What's-wrong #5: the sweep's measured numbers were
    docstring references — now the probe re-measures them and this
    test ASSERTS them. Realistic corpus: prefix-16 recall equals
    full-width recall exactly (quantization-bound, not width-bound —
    the Matryoshka win condition). Adversarial corpus: prefix recall
    is EXACTLY ZERO while full width reads >= 0.9 — the id-lottery
    worst case the guard exists for."""
    iso, tail = sweep_corpora
    probes = list(range(400, 410))

    def bp(corpus, prefix):
        return pq_ops.matryoshka_recall_probe(
            corpus, probes, 5, 30, prefix, 4, 8, 1
        ).collect()[0]["recall_bp"]

    iso16, iso64 = bp(iso, 16), bp(iso, 64)
    assert iso16 == iso64 and iso16 >= 5000
    assert bp(tail, 16) == 0
    assert bp(tail, 64) >= 9000


def test_matryoshka_build_guard_warns_and_raises(spark, sweep_corpora):
    """The build face acts on the probe: a non-MRL corpus warns below
    the floor (or raises under fail_below), the realistic corpus
    builds silently, and the guarded build's output is the plain
    build (the guard must not perturb the index)."""
    import warnings

    iso, tail = sweep_corpora
    probes = list(range(400, 410))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        books, codes = pq_ops.matryoshka_build_index(
            tail, 16, 4, 8, 1, probe_ids=probes, n_neighbors=5
        )
        guard = [x for x in w if "id-lottery" in str(x.message)]
        assert len(guard) == 1 and "0 bp" in str(guard[0].message)
    with pytest.raises(ValueError, match="id-lottery"):
        pq_ops.matryoshka_build_index(
            tail, 16, 4, 8, 1, probe_ids=probes, n_neighbors=5,
            fail_below=True,
        )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        books, codes = pq_ops.matryoshka_build_index(
            iso, 16, 4, 8, 1, probe_ids=probes, n_neighbors=5
        )
        assert not [x for x in w if "id-lottery" in str(x.message)]
    want_books, want_codes = pq_ops.pq_build_index(
        iso.select(
            "vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding")
        ),
        sub=4, k=8, iters=1, dims=16,
    )
    assert sorted(map(tuple, books.collect())) == sorted(
        map(tuple, want_books.collect())
    )
    assert sorted(map(tuple, codes.collect())) == sorted(
        map(tuple, want_codes.collect())
    )


def test_matryoshka_build_refuses_short_width_corpus(spark, emb16):
    """r12 ADVICE mirror of the query-side width check: prefix_dims is
    validated against the dims PARAMETER, so a corpus whose rows are
    narrower than prefix_dims used to slip through and slice() clamped
    silently — the index trained on truncated prefixes. The build now
    measures min(size(embedding)) and fails loudly."""
    with pytest.raises(ValueError, match="minimum embedding width 16"):
        pq_ops.matryoshka_build_index(
            emb16, prefix_dims=24, sub=4, k=8, iters=1, dims=32
        )
    # exactly-nesting width still builds
    books, _codes = pq_ops.matryoshka_build_index(
        emb16, prefix_dims=16, sub=4, k=8, iters=1, dims=16
    )
    assert books.count() > 0


def test_pq_index_geometry_sidecar_roundtrip_and_validation(
    spark, emb16, tmp_path
):
    """r12: write_pq_index(geometry=...) makes the persisted index
    self-describing; matryoshka_rerank_topk_indexed validates the
    query parameters against the trained geometry and refuses a
    mismatch (codes are meaningless under foreign books). Pre-sidecar
    layouts read geometry None and keep the historical contract."""
    from khronus_spark.operators.pq import read_pq_index_geometry

    prefix = emb16.select(
        "vec_id", F.expr("slice(embedding, 1, 8)").alias("embedding")
    )
    books, codes = pq_ops.pq_build_index(prefix, sub=4, k=8, iters=1, dims=8)
    plain = str(tmp_path / "plain")
    pq_ops.write_pq_index(books, codes, plain)
    assert read_pq_index_geometry(plain) is None

    sided = str(tmp_path / "sided")
    pq_ops.write_pq_index(
        books, codes, sided, geometry={"sub": 4, "k": 8, "dims": 8}
    )
    g = read_pq_index_geometry(sided)
    assert g == {"sub": 4, "k": 8, "dims": 8}

    books, codes = pq_ops.read_pq_index(spark, sided)
    pv = emb16.where("vec_id < 3").select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    ok = pq_ops.matryoshka_rerank_topk_indexed(
        books, codes, pv, emb16, 3, n_candidates=10, prefix_dims=8,
        sub=4, k=8, trained_geometry=g,
    )
    assert ok.count() == 9
    with pytest.raises(ValueError, match="trained dims=8"):
        pq_ops.matryoshka_rerank_topk_indexed(
            books, codes, pv, emb16, 3, prefix_dims=16, sub=4, k=8,
            trained_geometry=g,
        )
    with pytest.raises(ValueError, match="trained k=8"):
        pq_ops.matryoshka_rerank_topk_indexed(
            books, codes, pv, emb16, 3, prefix_dims=8, sub=4, k=16,
            trained_geometry=g,
        )


def test_geometry_sidecar_cleared_on_geometryless_rebuild(
    spark, emb16, tmp_path
):
    """Review pin: rebuilding an index at a previously self-describing
    path WITHOUT geometry must remove the old sidecar — a stale
    geometry would refuse correct queries against the new books (or
    wave through wrong ones)."""
    from khronus_spark.operators.pq import read_pq_index_geometry

    prefix = emb16.select(
        "vec_id", F.expr("slice(embedding, 1, 8)").alias("embedding")
    )
    books, codes = pq_ops.pq_build_index(prefix, sub=4, k=8, iters=1, dims=8)
    path = str(tmp_path / "idx")
    pq_ops.write_pq_index(books, codes, path, geometry={"dims": 8})
    assert read_pq_index_geometry(path) == {"dims": 8}
    pq_ops.write_pq_index(books, codes, path)  # geometry-less rebuild
    assert read_pq_index_geometry(path) is None


def test_pq_index_publish_is_atomic_generation_swap(spark, emb16, tmp_path):
    """r12 ADVICE: the old in-place write published books/codes and the
    geometry sidecar non-atomically — a reader between the parquet
    overwrite and the sidecar write could pair OLD geometry with NEW
    books. The writer now lands everything in a fresh gen-<token>/ and
    publishes with ONE CURRENT-pointer swap (the streaming/ann.py
    convention); the superseded generation stays readable (kept
    unconditionally as `prev`), so a reader that resolved before the
    swap keeps a consistent (books, codes, geometry) triple."""
    import os

    from khronus_spark.operators.pq import read_pq_index_geometry
    from khronus_spark.streaming.retrieval import resolve_generation_dir

    prefix = emb16.select(
        "vec_id", F.expr("slice(embedding, 1, 8)").alias("embedding")
    )
    books, codes = pq_ops.pq_build_index(prefix, sub=4, k=8, iters=1, dims=8)
    path = str(tmp_path / "idx")
    pq_ops.write_pq_index(books, codes, path, geometry={"dims": 8})
    gen1 = resolve_generation_dir(path)
    assert gen1 != path and os.path.isfile(os.path.join(path, "CURRENT"))
    assert os.path.isfile(os.path.join(gen1, "geometry.json"))

    pq_ops.write_pq_index(books, codes, path, geometry={"dims": 8, "v": 2})
    gen2 = resolve_generation_dir(path)
    assert gen2 != gen1
    assert read_pq_index_geometry(path) == {"dims": 8, "v": 2}
    # the pre-swap generation keeps its complete, self-consistent view
    assert os.path.isdir(os.path.join(gen1, "books"))
    assert os.path.isdir(os.path.join(gen1, "codes"))
    import json

    with open(os.path.join(gen1, "geometry.json")) as fh:
        assert json.load(fh) == {"dims": 8}
    # and the published view reads end-to-end
    b2, c2 = pq_ops.read_pq_index(spark, path)
    assert b2.count() == books.count() and c2.count() == codes.count()


def test_recall_probe_rejects_absent_and_duplicate_probes(spark, emb16):
    """Review pin: probe_ids absent from the corpus (or duplicated)
    would contribute zero hits while still counting in the
    denominator — a healthy index would spuriously fail the build
    guard. Fail loudly instead."""
    with pytest.raises(ValueError, match="exist in the corpus"):
        pq_ops.matryoshka_recall_probe(
            emb16, [0, 1, 10**9], 3, prefix_dims=8, sub=4, k=8,
            iters=1, dims=16,
        )
    with pytest.raises(ValueError, match="duplicates"):
        pq_ops.matryoshka_recall_probe(
            emb16, [0, 0, 1], 3, prefix_dims=8, sub=4, k=8,
            iters=1, dims=16,
        )
