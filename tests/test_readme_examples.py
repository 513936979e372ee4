"""The reference README's own documented example queries
(`/root/reference/README.md:86-136`), run verbatim through the engine
with only metric names swapped to the testdata catalog (timer →
"purchase", counter → "click")."""

from __future__ import annotations

import pytest

from khronus_spark.engine import KhronusEngine
from khronus_spark.sources.tables import measurements_from_events

NOW_MS = 1706659200000  # end of the events span

EXAMPLES = [
    'select max , min as minimum from "purchase" where time > now()-6h group by time(5m)',
    'select count from "click" where time > now()-6h group by time(5m)',
    'select * from "purchase" where time > now()-30m group by time(5m)',
    'select percentiles from "purchase" where time > now()-1h group by time(5m)',
    'select percentiles(50 80 99) from "purchase" where time > now()-6h group by time(5m)',
    'select cpm from "purchase" where time > now()-1h group by time(5m)',
    'select cpm from "purchase" where time > now()-1h group by time(1h)',
    'select -9.87 as negativeNumber from "purchase" where time > now()-6h group by time(5m)',
    'select timer.max - timer.min as myOperation from "purchase" as timer '
    "where time > now()-6h group by time(5m)",
]


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return KhronusEngine(
        spark,
        measurements=measurements_from_events(spark, sf_dir),
        now_ms=NOW_MS,
    )


@pytest.mark.parametrize("query", EXAMPLES)
def test_readme_example_runs(engine, query):
    results = engine.sql(query)
    assert results, query
    for series in results:
        rows = series.df.collect()
        assert list(series.df.columns) == ["time", "value"]
        for r in rows:
            assert r["time"] is not None
