"""DateMathParser analog goldens (DateMathParser.java:120-366)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from lucene_solr_spark.functions.datemath import parse_date_math, parse_math

NOW = datetime(2024, 1, 25, 13, 47, 9, 123456, tzinfo=timezone.utc)


def _d(*a):
    return datetime(*a, tzinfo=timezone.utc)


@pytest.mark.parametrize(
    "expr,want",
    [
        ("", NOW),
        ("/DAY", _d(2024, 1, 25)),
        ("/DAY-7DAYS", _d(2024, 1, 18)),
        ("/HOUR+30MINUTES", _d(2024, 1, 25, 13, 30)),
        ("/MONTH", _d(2024, 1, 1)),
        ("/YEAR", _d(2024, 1, 1)),
        ("/MINUTE", _d(2024, 1, 25, 13, 47)),
        ("/SECOND", _d(2024, 1, 25, 13, 47, 9)),
        ("+2YEARS-1MONTH/DAY", _d(2025, 12, 25)),
        ("-1MILLI", _d(2024, 1, 25, 13, 47, 9, 122456)),
    ],
)
def test_parse_math_goldens(expr, want):
    assert parse_math(expr, NOW) == want


@pytest.mark.parametrize(
    "s,want",
    [
        # Calendar.add month clamping (lenient java.util.Calendar)
        ("2024-01-31T00:00:00Z+1MONTH", _d(2024, 2, 29)),
        ("2023-01-31T00:00:00Z+1MONTH", _d(2023, 2, 28)),
        ("2024-02-29T10:00:00Z+1YEAR", _d(2025, 2, 28, 10)),
        ("2024-03-31T00:00:00Z-1MONTH", _d(2024, 2, 29)),
        ("2016-04-01T09:30:15Z/DAY+12HOURS", _d(2016, 4, 1, 12)),
        ("NOW/DAY", _d(2024, 1, 25)),
    ],
)
def test_parse_date_math_goldens(s, want):
    assert parse_date_math(s, NOW) == want


@pytest.mark.parametrize(
    "expr,msg",
    [
        ("*5DAYS", "Unrecognized command"),
        ("/FOO", "Rounding Unit not recognized"),
        ("+DAY", "Need a value and unit"),
        ("+DAY+1DAY", "Not a Number"),
        ("+5", "Need a value and unit"),
        ("/", "Need a unit after command"),
        ("+5FOO", "Unit not recognized"),
        ("/MILLI", "No logic for rounding"),
    ],
)
def test_error_surface(expr, msg):
    with pytest.raises(ValueError, match=msg):
        parse_math(expr, NOW)


def test_invalid_date_string():
    with pytest.raises(ValueError, match="Invalid Date String"):
        parse_date_math("tomorrow", NOW)
