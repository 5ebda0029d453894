"""Elasticsearch date math for range bounds: `now-7d/d`,
`2024-01-04||+1w/d`, resolved at COMPILE time to plain timestamp
literals (both SQL dialects coerce a date-shaped string against a
temporal column — the module's _lit rule, pushdown-verified).

Semantics (the ES range-query rounding table, implemented exactly):

- anchor: `now` or `<ISO date[T time]>||`
- operations: `+N<unit>` / `-N<unit>` with units y M w d h H m s
  (calendar-aware for y/M — hand-rolled month arithmetic, no external
  deps); one optional TRAILING `/unit` rounding (mid-chain rounding
  raises — rare, and silently mis-rounding would be worse)
- operator interaction with `/unit` rounding:
    gte rounds DOWN  (start of unit)
    lt  rounds DOWN  (excludes the entire unit)
    gt  rounds UP    -> rewritten `gte <next unit start>` (exact: no
                        last-millisecond literal to disagree on)
    lte rounds UP    -> rewritten `lt <next unit start>`
  The op REWRITE is the determinism trick: both engines compare
  against clean unit boundaries instead of a .999999 instant.

`now` resolution: deterministic callers (tests, registered entries)
either use absolute `<date>||` anchors or pin the clock with
`set_now()`; unpinned `now` resolves to the real current UTC instant —
the serving default a live HTTP user expects.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_NOW_OVERRIDE: datetime | None = None


def set_now(dt: datetime | None) -> None:
    """Pin (or unpin, with None) the `now` anchor — test/driver
    determinism hook."""
    global _NOW_OVERRIDE
    _NOW_OVERRIDE = dt


_ANCHOR_RE = re.compile(
    r"^(now|(?P<date>\d{4}-\d{2}-\d{2}(?:[T ]\d{2}:\d{2}:\d{2})?)\|\|)"
)
_OP_RE = re.compile(r"([+-])(\d+)([yMwdhHms])|/([yMwdhHms])")

_FIXED_SECONDS = {"w": 604800, "d": 86400, "h": 3600, "H": 3600,
                  "m": 60, "s": 1}


def looks_like_date_math(s: str) -> bool:
    return isinstance(s, str) and (
        s == "now" or s.startswith("now+") or s.startswith("now-")
        or s.startswith("now/") or "||" in s
    )


def _add_months(dt: datetime, n: int) -> datetime:
    months = dt.month - 1 + n
    y, m = dt.year + months // 12, months % 12 + 1
    # clamp the day (Jan 31 + 1M = Feb 28/29), the ES/java.time rule
    for day in (dt.day, 30, 29, 28):
        try:
            return dt.replace(year=y, month=m, day=day)
        except ValueError:
            continue
    raise AssertionError("unreachable")  # pragma: no cover


def _truncate(dt: datetime, unit: str) -> datetime:
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "w":
        # ISO week: Monday start (the ES /w rule)
        start = (dt - timedelta(days=dt.weekday())).replace(
            hour=0, minute=0, second=0, microsecond=0)
        return start
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    return dt.replace(microsecond=0)  # s


def _next_unit(dt: datetime, unit: str) -> datetime:
    base = _truncate(dt, unit)
    if unit == "y":
        return base.replace(year=base.year + 1)
    if unit == "M":
        return _add_months(base, 1)
    return base + timedelta(seconds=_FIXED_SECONDS[unit])


def resolve(expr: str, op: str) -> tuple[str, str]:
    """Resolve one date-math string under a range operator. Returns
    (possibly-rewritten op, 'YYYY-MM-DD HH:MM:SS' literal)."""
    m = _ANCHOR_RE.match(expr)
    if not m:
        raise ValueError(f"es_dsl: bad date math anchor in {expr!r}")
    if m.group(1) == "now":
        dt = _NOW_OVERRIDE or datetime.now(timezone.utc).replace(tzinfo=None)
    else:
        d = m.group("date").replace("T", " ")
        fmt = "%Y-%m-%d %H:%M:%S" if " " in d else "%Y-%m-%d"
        dt = datetime.strptime(d, fmt)
    rest = expr[m.end():]
    pos = 0
    rounding: str | None = None
    for om in _OP_RE.finditer(rest):
        if om.start() != pos:
            raise ValueError(f"es_dsl: bad date math {expr!r}")
        pos = om.end()
        if om.group(4):  # /unit rounding
            if pos != len(rest):
                raise ValueError(
                    f"es_dsl: date math rounding must be the last "
                    f"operation ({expr!r})"
                )
            rounding = om.group(4)
            break
        sign = 1 if om.group(1) == "+" else -1
        n, unit = sign * int(om.group(2)), om.group(3)
        if unit == "y":
            dt = _add_months(dt, 12 * n)
        elif unit == "M":
            dt = _add_months(dt, n)
        else:
            dt = dt + timedelta(seconds=n * _FIXED_SECONDS[unit])
    if pos != len(rest):
        raise ValueError(f"es_dsl: bad date math {expr!r}")
    if rounding:
        if op in ("gte", "lt"):
            dt = _truncate(dt, rounding)
        elif op == "gt":
            op, dt = "gte", _next_unit(dt, rounding)
        elif op == "lte":
            op, dt = "lt", _next_unit(dt, rounding)
        else:  # pragma: no cover — the range handler validates ops
            raise ValueError(f"es_dsl: bad range op {op!r}")
    else:
        dt = dt.replace(microsecond=0)
    return op, dt.strftime("%Y-%m-%d %H:%M:%S")
