"""Solr date-math grammar — DateMathParser analog.

Reference: solr/core/src/java/org/apache/solr/util/DateMathParser.java
(unit table :120-148, round() cascade :174-215, parseMath() command
loop :302-366, token splitter :368) and the TrieDateField convention
that a full date-math string is either ``NOW<math>`` or
``<ISO-8601>Z<math>`` (math may be empty).

Semantics preserved:
- units YEAR(S) MONTH(S) DAY(S)/DATE HOUR(S) MINUTE(S) SECOND(S)
  MILLI(S)/MILLISECOND(S), all in UTC (DEFAULT_MATH_TZ);
- ``/UNIT`` rounds DOWN by clearing every finer calendar field
  (the round() fall-through cascade);
- ``+N UNIT`` / ``-N UNIT`` use calendar arithmetic: adding months or
  years clamps the day-of-month to the target month's length exactly
  like java.util.Calendar.add (Jan 31 + 1MONTH -> Feb 29 in a leap
  year);
- the token splitter is the same ``\\b|(?<=\\d)(?=\\D)`` pattern, and
  malformed input raises ValueError with the reference's message
  shapes ("Unrecognized command", "Unit not recognized", ...).

Driver-side only: a date-math string resolves to ONE timestamp bound
before the query plans, so the filter reaching the parquet scan is a
plain pushed-down timestamp comparison.
"""

from __future__ import annotations

import calendar as _cal
import re
from datetime import datetime, timedelta, timezone

# CALENDAR_UNITS (DateMathParser.java:120-148), mapped to a canonical
# unit keyword
_UNITS = {}
for _names, _canon in (
    (("YEAR", "YEARS"), "YEAR"),
    (("MONTH", "MONTHS"), "MONTH"),
    (("DAY", "DAYS", "DATE"), "DAY"),
    (("HOUR", "HOURS"), "HOUR"),
    (("MINUTE", "MINUTES"), "MINUTE"),
    (("SECOND", "SECONDS"), "SECOND"),
    (("MILLI", "MILLIS", "MILLISECOND", "MILLISECONDS"), "MILLI"),
):
    for _n in _names:
        _UNITS[_n] = _canon

_SPLITTER = re.compile(r"\b|(?<=\d)(?=\D)")


def _add(dt: datetime, val: int, unit: str) -> datetime:
    """Calendar.add semantics (day-of-month clamps on month/year
    moves — java.util.Calendar's lenient month arithmetic)."""
    u = _UNITS.get(unit)
    if u is None:
        raise ValueError(f'Unit not recognized: "{unit}"')
    if u == "YEAR":
        return _add_months(dt, 12 * val)
    if u == "MONTH":
        return _add_months(dt, val)
    delta = {
        "DAY": timedelta(days=val),
        "HOUR": timedelta(hours=val),
        "MINUTE": timedelta(minutes=val),
        "SECOND": timedelta(seconds=val),
        "MILLI": timedelta(milliseconds=val),
    }[u]
    return dt + delta


def _add_months(dt: datetime, months: int) -> datetime:
    y, m = divmod((dt.year * 12 + dt.month - 1) + months, 12)
    m += 1
    day = min(dt.day, _cal.monthrange(y, m)[1])
    return dt.replace(year=y, month=m, day=day)


def _round(dt: datetime, unit: str) -> datetime:
    """round() fall-through cascade (DateMathParser.java:174-215):
    each case clears every finer field."""
    u = _UNITS.get(unit)
    if u is None:
        raise ValueError(f'Rounding Unit not recognized: "{unit}"')
    if u == "MILLI":
        # Calendar has no sub-milli precision to clear; Solr's round()
        # raises IllegalStateException for MILLI — mirror as ValueError
        raise ValueError(f'No logic for rounding value {unit}')
    repl = {"microsecond": 0}
    if u in ("YEAR",):
        repl.update(month=1, day=1, hour=0, minute=0, second=0)
    elif u == "MONTH":
        repl.update(day=1, hour=0, minute=0, second=0)
    elif u == "DAY":
        repl.update(hour=0, minute=0, second=0)
    elif u == "HOUR":
        repl.update(minute=0, second=0)
    elif u == "MINUTE":
        repl.update(second=0)
    elif u == "SECOND":
        pass
    return dt.replace(**repl)


def parse_math(math: str, now: datetime) -> datetime:
    """parseMath (DateMathParser.java:302-366): apply a ``/UNIT`` /
    ``+N UNIT`` / ``-N UNIT`` command string to ``now`` (UTC)."""
    dt = now if now.tzinfo else now.replace(tzinfo=timezone.utc)
    if not math:
        return dt
    ops = [t for t in _SPLITTER.split(math) if t]
    pos = 0
    while pos < len(ops):
        if len(ops[pos]) != 1:
            raise ValueError(f'Multi character command found: "{ops[pos]}"')
        command = ops[pos]
        pos += 1
        if command == "/":
            if len(ops) < pos + 1:
                raise ValueError(f'Need a unit after command: "{command}"')
            dt = _round(dt, ops[pos])
            pos += 1
        elif command in "+-":
            if len(ops) < pos + 2:
                raise ValueError(
                    f'Need a value and unit for command: "{command}"'
                )
            try:
                val = int(ops[pos])
            except ValueError:
                raise ValueError(f'Not a Number: "{ops[pos]}"') from None
            pos += 1
            if command == "-":
                val = -val
            dt = _add(dt, val, ops[pos])
            pos += 1
        else:
            raise ValueError(f'Unrecognized command: "{command}"')
    return dt


def parse_date_math(s: str, now: datetime) -> datetime:
    """Full date-math string: ``NOW<math>`` or ``<ISO-8601>Z<math>``
    (TrieDateField convention — the math suffix starts after the
    trailing 'Z' of an explicit instant)."""
    if s.startswith("NOW"):
        return parse_math(s[3:], now)
    i = s.find("Z")
    if i < 0:
        raise ValueError(
            f"Invalid Date String: {s!r} (expected NOW<math> or "
            "<ISO-8601>Z<math>)"
        )
    base = datetime.fromisoformat(s[:i]).replace(tzinfo=timezone.utc)
    return parse_math(s[i + 1:], base)
