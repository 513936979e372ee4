"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet,
then compare row count, schema width, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


#: DuckDB logical type → comparison tag. The driver hashes values after a
#: pandas/Arrow conversion, where HUGEINT (un-cast sum(BIGINT)) degrades to
#: float64 while Spark's BIGINT stays int64 — equal values, different
#: hashes (the round-1 and round-2 red-row class). Tag HUGEINT-like types
#: distinctly so the LOCAL gate goes red before the driver's does.
_DUCK_TAGS = {
    "TINYINT": "i", "SMALLINT": "i", "INTEGER": "i", "BIGINT": "i",
    "UTINYINT": "i", "USMALLINT": "i", "UINTEGER": "i",
    "HUGEINT": "int128", "UBIGINT": "uint64", "UHUGEINT": "int128",
    "FLOAT": "f", "DOUBLE": "f",
    "VARCHAR": "s", "BOOLEAN": "b", "DATE": "date",
}


def _duck_tag(typ: str) -> str:
    base = typ.split("(")[0].strip()
    if base.endswith("[]"):
        return "list<" + _duck_tag(base[:-2]) + ">"
    if base.startswith("DECIMAL"):
        return "dec"
    if base.startswith("TIMESTAMP"):
        return "ts"
    return _DUCK_TAGS.get(base, base)


def _spark_tag(dtype: str) -> str:
    if dtype.startswith("array<"):
        return "list<" + _spark_tag(dtype[6:-1]) + ">"
    if dtype.startswith("decimal"):
        return "dec"
    if dtype.startswith("timestamp"):
        return "ts"
    return {
        "tinyint": "i", "smallint": "i", "int": "i", "bigint": "i",
        "float": "f", "double": "f",
        "string": "s", "boolean": "b", "date": "date",
    }.get(dtype, dtype)


#: The ONLY logical-type tags with proven cross-engine hash
#: canonicalization under the driver's typed value-hash (every tag here
#: is carried by at least one historically hash-green driver row):
#: int64, string, boolean, double, date. Everything else — DECIMAL
#: (the r12 embedding_dim_stats red row: Spark materializes Decimal,
#: DuckDB's client path float64, equal values hash apart), HUGEINT
#: (rounds 1-2), intervals, timestamps-with-zone, structs — must be
#: cast to a canonical face before it reaches a driver-facing column.
_CANONICAL_TAGS = {"i", "s", "b", "f", "date"}


def _non_canonical(tags: dict[str, str]) -> dict[str, str]:
    """column -> tag for every driver-facing column whose logical-type
    tag lacks a proven cross-engine hash canonicalization."""
    return {c: t for c, t in tags.items() if t not in _CANONICAL_TAGS}


def _normalize(rows, colnames):
    """Sort columns by name, canonicalize values TYPE-TAGGED, return
    sorted rows. int and float canon differently (('i', 123) vs
    ('f', 123.0)) mirroring the driver's typed value-hash, so a
    numerically-equal-but-differently-typed result fails locally."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            return ("i", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "NaN")
            return ("f", round(v, 9))
        if hasattr(v, "isoformat"):
            return ("ts", v.isoformat())
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                return ("dec", round(float(v), 9))
        except Exception:
            pass
        return v

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle_sf_dir, name):
    fn = QUERIES[name]
    sdf = fn(spark, oracle_sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if name not in ORACLES:
        # rows-only check, like the driver's weaker gate
        assert isinstance(spark_rows, list)
        return

    con = _duck_con(oracle_sf_dir)
    duck_desc = con.execute(f"DESCRIBE ({ORACLES[name]})").fetchall()
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    # Type-strict schema gate: the driver's value hash is typed (pandas /
    # Arrow conversion), so an oracle emitting HUGEINT where Spark emits
    # BIGINT red-flags at the driver even when every value is equal.
    # Compare logical-type tags per column name so that class of bug
    # fails HERE first.
    spark_tags = {c: _spark_tag(t) for c, t in sdf.dtypes}
    duck_tags = {d[0]: _duck_tag(d[1]) for d in duck_desc}
    tag_mismatch = {
        c: (spark_tags[c], duck_tags[c])
        for c in spark_tags
        if spark_tags[c] != duck_tags.get(c)
    }
    assert not tag_mismatch, f"{name}: column type mismatch {tag_mismatch}"
    # r13 canonical-type lint (per-entry Spark face): matching tags are
    # NOT enough — "dec" == "dec" passed the r12 embedding_dim_stats
    # entry locally while the driver hash split on the two engines'
    # decimal materializations. Every driver-facing column must carry a
    # tag with a proven cross-engine hash canonicalization.
    assert not _non_canonical(spark_tags), (
        f"{name}: driver-facing Spark columns without a hash-canonical "
        f"type {_non_canonical(spark_tags)} — cast to long/string/"
        "boolean/double/date before the driver sees them"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sn = _normalize(spark_rows, spark_cols)
    dn = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_uncast_hugeint_oracle_goes_red():
    """Regression fixture for the round-1/round-2 red-row class: a DuckDB
    oracle whose aggregate is left un-cast (sum(BIGINT) → HUGEINT) MUST
    mismatch a Spark BIGINT column under the type-strict gate, even
    though every value is numerically equal."""
    con = duckdb.connect()
    desc = con.execute(
        "DESCRIBE (SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x))"
    ).fetchall()
    assert _duck_tag(desc[0][1]) == "int128"
    assert _duck_tag(desc[0][1]) != _spark_tag("bigint")
    # and the cast form is accepted
    desc_ok = con.execute(
        "DESCRIBE (SELECT CAST(sum(x) AS BIGINT) AS s"
        " FROM (SELECT CAST(1 AS BIGINT) AS x))"
    ).fetchall()
    assert _duck_tag(desc_ok[0][1]) == _spark_tag("bigint")


def test_all_oracles_free_of_hugeint(oracle_sf_dir):
    """Static sweep: no registered oracle may emit a HUGEINT-class
    column. This is the check the round-2 verdict ran by hand; run it
    every time so un-cast sums can't ship."""
    con = _duck_con(oracle_sf_dir)
    offenders = []
    for name, sql in sorted(ORACLES.items()):
        for col, typ, *_ in con.execute(f"DESCRIBE ({sql})").fetchall():
            if _duck_tag(typ) in ("int128", "uint64"):
                offenders.append((name, col, typ))
    assert not offenders, f"un-cast wide-integer oracle columns: {offenders}"


def test_all_oracles_hash_canonical(oracle_sf_dir):
    """Registry-wide canonical-type lint, oracle side (the r12 miss
    generalized from HUGEINT to EVERY non-canonical face): DESCRIBE
    each oracle — no execution — and assert every driver-facing column
    tags into the proven-canonical set. A DECIMAL face like the r12
    `embedding_dim_stats` var_num fails HERE, locally, instead of in
    the driver artifact. The Spark half of the same lint runs
    per-entry inside test_query_matches_oracle (the Spark schema only
    exists once the entry has built its frame)."""
    con = _duck_con(oracle_sf_dir)
    offenders = {}
    for name, sql in sorted(ORACLES.items()):
        tags = {
            col: _duck_tag(typ)
            for col, typ, *_ in con.execute(f"DESCRIBE ({sql})").fetchall()
        }
        bad = _non_canonical(tags)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracle columns without a hash-canonical type: {offenders} — "
        "cast to BIGINT/VARCHAR/BOOLEAN/DOUBLE/DATE before the driver "
        "hashes them"
    )


def test_decimal_face_goes_red():
    """Red fixture for the r12 red-row class: a DECIMAL driver-facing
    column must be flagged by the canonical-type lint on BOTH engines'
    tag sides, even though the parity suite's value canon would have
    compared the values as semantically equal — exactly how the r12
    embedding_dim_stats row passed locally and went red at the driver."""
    con = duckdb.connect()
    desc = con.execute(
        "DESCRIBE (SELECT CAST(42 AS DECIMAL(38,0)) AS var_num)"
    ).fetchall()
    duck_tags = {d[0]: _duck_tag(d[1]) for d in desc}
    assert _non_canonical(duck_tags) == {"var_num": "dec"}
    assert _non_canonical({"var_num": _spark_tag("decimal(38,0)")}) == {
        "var_num": "dec"
    }
    # and the canonicalized STRING face is accepted on both sides
    desc_ok = con.execute(
        "DESCRIBE (SELECT CAST(CAST(42 AS DECIMAL(38,0)) AS VARCHAR)"
        " AS var_num)"
    ).fetchall()
    assert not _non_canonical({d[0]: _duck_tag(d[1]) for d in desc_ok})
    assert not _non_canonical({"var_num": _spark_tag("string")})


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["series", "metric", "time", "value"]


def test_window_rotation_covers_unproven():
    """The driver's gate checks only the first DRIVER_WINDOW entries of
    queries(). Rotation invariant: every registry entry must either
    carry a green driver row from a past round (or a by-design
    no_oracle rows-only row) or sit inside the CURRENT window — so a
    newly added operator that never saw the driver cannot hide in the
    tail, and a red row must stay in the window until proven green."""
    import glob
    import json
    from pathlib import Path

    from khronus_spark.entry_queries import (
        _PRIORITY,
        DRIVER_WINDOW,
        PENDING_NEXT_WINDOW,
    )

    names = list(QUERIES)
    assert len(_PRIORITY) == DRIVER_WINDOW
    assert names[:DRIVER_WINDOW] == _PRIORITY

    repo = Path(__file__).resolve().parent.parent
    proven: set[str] = set()
    for path in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        for name, row in json.loads(Path(path).read_text()).items():
            if row.get("hash_match") or row.get("err") == "no_oracle":
                proven.add(name)
    window = set(_PRIORITY)
    # the explicit next-window queue: entries registered after the
    # current window froze may wait there — but only oracle-backed
    # registry entries, never window members (no double-booking), and
    # the queue must drain into the next round's window before any
    # other rotation (policy documented at its definition site)
    pending = set(PENDING_NEXT_WINDOW)
    assert pending <= set(names), pending - set(names)
    assert not pending & window, pending & window
    assert all(n in ORACLES for n in pending), [
        n for n in pending if n not in ORACLES
    ]
    uncovered = [
        n for n in names if n not in proven and n not in window and n not in pending
    ]
    assert not uncovered, (
        f"{len(uncovered)} entries have no green driver row and are "
        f"outside the window and the pending queue: {uncovered}"
    )
    # every windowed entry must be hash-checkable (an oracle exists) —
    # rows-only entries prove themselves via stream==batch tests instead
    # and keep their past no_oracle row
    missing_oracle = [n for n in _PRIORITY if n not in ORACLES]
    assert not missing_oracle, missing_oracle


def test_ledger_count_line_matches_registry():
    """r11 verdict What's-wrong #1: the round-notes ledger hand-wrote
    a registry count that drifted from the importable truth. The count
    line in COVERAGE.md is now generated by scripts/registry_counts.py
    and this test pins it to the registry itself — the ledger can no
    longer disagree with the code."""
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "scripts"))
    try:
        from registry_counts import counts
    finally:
        sys.path.pop(0)
    want = counts()
    coverage = (repo / "COVERAGE.md").read_text()
    assert want in coverage, (
        f"COVERAGE.md's ledger count line is stale — regenerate it:\n"
        f"  python scripts/registry_counts.py\n"
        f"expected line: {want}"
    )


def test_round_notes_quote_driver_artifact():
    """r12 verdict What's-wrong #2: ROUND12_NOTES' closing state read
    all-green while CORRECTNESS_r12 carried a red hash row. The newest
    round notes must quote the LATEST driver artifact's machine-derived
    green/red/err line (scripts/registry_counts.py::driver_row_line) —
    a red driver row can no longer coexist with an all-green closing
    narrative, because the narrative is generated from the artifact."""
    import re
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "scripts"))
    try:
        from registry_counts import driver_row_line
    finally:
        sys.path.pop(0)
    notes = sorted(
        repo.glob("ROUND*_NOTES.md"),
        key=lambda p: int(re.search(r"ROUND(\d+)", p.name).group(1)),
    )
    assert notes, "no round notes found"
    want = driver_row_line()
    text = notes[-1].read_text()
    assert want in text, (
        f"{notes[-1].name} does not quote the driver artifact — "
        f"regenerate with scripts/registry_counts.py; expected line:\n"
        f"{want}"
    )
