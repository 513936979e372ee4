"""Unit tests for the time-grid library — semantics ported from the
reference's resolver/tick specs (`InfluxQueryResolverSpec.scala:70-381`,
`TickTest.scala:18-68`)."""

from __future__ import annotations

import pytest

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

S, M, H = 1000, 60_000, 3_600_000


def test_parse_duration():
    assert parse_duration_ms("30s") == 30 * S
    assert parse_duration_ms("5m") == 5 * M
    assert parse_duration_ms("1h") == H
    assert parse_duration_ms("250ms") == 250
    assert parse_duration_ms("2d") == 48 * H
    assert parse_duration_ms("1w") == 7 * 24 * H
    assert parse_duration_ms("1234") == 1234  # bare number = millis
    with pytest.raises(ValueError):
        parse_duration_ms("5x")


def test_format_duration_roundtrip():
    for ms in DEFAULT_WINDOWS_MS:
        assert parse_duration_ms(format_duration(ms)) == ms


def test_alignment():
    # aligned values stay put; from ceils, to floors
    # (InfluxQueryResolver.scala:120-133)
    assert align_floor(60_000, 60_000) == 60_000
    assert align_ceil(60_000, 60_000) == 60_000
    assert align_floor(60_001, 60_000) == 60_000
    assert align_ceil(59_999, 60_000) == 60_000
    assert align_ceil(60_001, 60_000) == 120_000


def test_time_range_spine():
    tr = build_time_range(Slice(60_001, 300_000), 60_000)
    assert tr.from_ms == 120_000 and tr.to_ms == 300_000
    assert list(tr.spine()) == [120_000, 180_000, 240_000, 300_000]


def test_adjust_resolution_nearest_window():
    # "nearest configured window" (InfluxQueryResolverSpec: forced cases)
    slc = Slice(0, 100 * 5 * M)  # 500 points at 5m
    assert adjust_resolution(slc, 5 * M, force=True) == 5 * M
    assert adjust_resolution(slc, 4 * M, force=True) == 5 * M
    assert adjust_resolution(slc, 2 * M, force=True) == M
    # 20m ties between 10m and 30m: the descending fold sees 30m first
    # and the comparison is strict, so 30m wins (reference fold semantics)
    assert adjust_resolution(slc, 20 * M, force=True) == 30 * M
    assert adjust_resolution(slc, 10 * H, force=True) == H
    # tie between 30s and 1m at desired=45s goes to the smaller window
    assert adjust_resolution(slc, 45 * S, force=True) == 30 * S


def test_adjust_resolution_point_bounds():
    # in-range request is kept
    slc = Slice(0, 300 * 5 * M)  # 300 points at 5m
    assert adjust_resolution(slc, 5 * M) == 5 * M
    # too few points → finer window whose count fits
    slc = Slice(0, 6 * H)  # 6h span: 5m→72 pts (<100), 1m→360 pts
    assert adjust_resolution(slc, 5 * M) == M
    # too many points → coarser window
    slc = Slice(0, 24 * H)  # 24h: 1m→1440 (>700), 5m→288
    assert adjust_resolution(slc, M) == 5 * M
    # tiny slice: every window under-shoots → finest
    slc = Slice(0, 10 * M)
    assert adjust_resolution(slc, H) == 30 * S
    # huge slice: every window over-shoots → coarsest
    slc = Slice(0, 60 * 24 * H)
    assert adjust_resolution(slc, 30 * S) == H


def test_adjust_resolution_tie_matches_reference_fold():
    """r13 review adjudication: the review flagged the equidistant
    tie as going to the wrong (larger) window, citing this module's
    own docstring. The REFERENCE disagrees with its old docstring:
    its foldLeft runs over the DESCENDING window list with a strict
    '<' seeded by the finest (InfluxQueryResolver.scala:90-92), so
    the first-seen LARGER window keeps a tie — 7.5m between 5m and
    10m resolves to 10m, 45s between 30s and 1m keeps 30s only
    because the finest is the fold's seed. The docstring was fixed;
    the behavior is pinned here bit-for-bit against the fold."""
    from khronus_spark.timegrid import Slice, adjust_resolution

    slc = Slice(0, 3_600_000)
    assert adjust_resolution(slc, 450_000, force=True) == 600_000  # tie -> 10m
    # one-sided nearness still picks the genuinely closer window
    assert adjust_resolution(slc, 450_001, force=True) == 600_000
    assert adjust_resolution(slc, 449_999, force=True) == 300_000
    # the midpoint between the two finest windows keeps the finest
    # (the seed, not a smaller-tie rule)
    assert adjust_resolution(slc, 45_000, force=True) == 30_000
