"""Property-based tests (hypothesis) for the pure-Python kernels the
engine's correctness leans on: time-grid arithmetic, duration parsing,
the histogram blob codec, and slice → range invariants.

These run without Spark, so hundreds of generated cases cost
milliseconds — the generated-input complement to the example-based
conformance tests in test_timegrid.py / test_encoding.py.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from khronus_spark.functions.encoding import decode_hist, encode_hist
from khronus_spark.timegrid import (
    DEFAULT_WINDOWS_MS,
    Slice,
    adjust_resolution,
    align_ceil,
    align_floor,
    build_time_range,
    format_duration,
    parse_duration_ms,
)

TS = st.integers(min_value=0, max_value=2**53)
WINDOW = st.sampled_from(DEFAULT_WINDOWS_MS)


@given(TS, WINDOW)
def test_align_floor_ceil_bracket(ts, w):
    lo, hi = align_floor(ts, w), align_ceil(ts, w)
    assert lo % w == 0 and hi % w == 0
    assert lo <= ts <= hi
    assert hi - lo in (0, w)
    assert (hi == lo) == (ts % w == 0)


@given(TS, WINDOW)
def test_align_idempotent(ts, w):
    assert align_floor(align_floor(ts, w), w) == align_floor(ts, w)
    assert align_ceil(align_ceil(ts, w), w) == align_ceil(ts, w)


@given(TS, TS, WINDOW)
def test_time_range_spine_inside_slice(a, b, w):
    lo, hi = min(a, b), max(a, b)
    tr = build_time_range(Slice(lo, hi), w)
    pts = tr.spine()  # a range: len/indexing are O(1) — never
    n = len(pts)  # materialize (generated slices span 2^53 ms)
    # every spine point is aligned and inside the original slice;
    # an empty spine happens only when the slice spans no full bucket
    if n:
        assert pts[0] % w == 0 and lo <= pts[0] <= hi
        assert pts[-1] % w == 0 and lo <= pts[-1] <= hi
        assert pts[0] == tr.from_ms and pts[-1] == tr.to_ms
        assert n == (tr.to_ms - tr.from_ms) // w + 1
    else:
        assert hi - lo < 2 * w


@given(st.integers(min_value=1, max_value=10**7), st.sampled_from(["ms", "s", "m", "h", "d", "w"]))
def test_duration_roundtrip(n, suffix):
    ms = parse_duration_ms(f"{n}{suffix}")
    assert parse_duration_ms(format_duration(ms)) == ms


@given(TS, TS, st.integers(min_value=1, max_value=10**9))
@settings(max_examples=200)
def test_adjust_resolution_bounds(a, b, desired):
    lo, hi = min(a, b), max(a, b)
    w = adjust_resolution(Slice(lo, hi), desired)
    assert w in DEFAULT_WINDOWS_MS
    # the chosen window never produces more than max_points... unless
    # even the coarsest window would (huge slice pins to coarsest)
    points = (hi - lo) // w
    if points > 700:
        assert w == max(DEFAULT_WINDOWS_MS)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=2**31),
        ),
        max_size=200,
    )
)
@settings(max_examples=200)
def test_encode_decode_roundtrip(pairs):
    # codec contract: values sorted ascending, distinct
    uniq = sorted({v: c for v, c in pairs}.items())
    assert decode_hist(encode_hist(uniq)) == uniq


# ---- parser round-trip (generated queries) --------------------------------

from khronus_spark.parser.parser import InfluxQueryParser  # noqa: E402

_FNS = ["count", "min", "max", "mean", "cpm", "p50", "p95", "p999"]
_IDENT = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_]{0,20}", fullmatch=True).filter(
    lambda s: s.lower() not in {"select", "from", "where", "group", "by", "time", "as", "fill", "scale", "limit", "order", "desc", "asc", "and", "now"}
)


@given(
    fn=st.sampled_from(_FNS),
    metric=_IDENT,
    t_sec=st.integers(min_value=1, max_value=10**9),
    w_min=st.integers(min_value=1, max_value=600),
    fill=st.one_of(st.none(), st.integers(min_value=0, max_value=1000)),
    scale=st.one_of(st.none(), st.integers(min_value=1, max_value=100)),
    limit=st.one_of(st.none(), st.integers(min_value=1, max_value=700)),
    desc=st.booleans(),
)
@settings(max_examples=300)
def test_parser_roundtrip_generated_queries(
    fn, metric, t_sec, w_min, fill, scale, limit, desc
):
    """Every structurally valid query built from the grammar must parse
    back to exactly the components it was built from."""
    q = f'select {fn} from "{metric}" where time > {t_sec}s group by time({w_min}m)'
    if fill is not None:
        q += f" fill({fill})"
    if scale is not None:
        q += f" scale({scale})"
    if limit is not None:
        q += f" limit {limit}"
    if desc:
        q += " order desc"
    parsed = InfluxQueryParser(now_ms=0).parse(q)

    assert len(parsed.projections) == 1
    proj = parsed.projections[0]
    assert proj.name == fn and proj.alias is None
    assert parsed.tables[0].name == metric
    tf = [f for f in parsed.filters if hasattr(f, "value_ms")]
    assert tf[0].operator == ">" and tf[0].value_ms == t_sec * 1000
    assert parsed.group_by.duration_ms == w_min * 60_000
    assert parsed.fill == (float(fill) if fill is not None else None)
    assert parsed.scale == (float(scale) if scale is not None else None)
    assert parsed.limit == limit
    assert parsed.order_asc == (not desc)
