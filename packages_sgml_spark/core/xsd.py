"""XSD lexical types: number and dateTime parsing/canonicalization.

Semantics follow the reference's xsd.c:
- xsd_number_string (xsd.c:70-240): XML Schema float lexical space —
  NaN, INF, -INF, '.5', '5.', exponent forms; canonical output uses
  the E-notation rules; integers pass through exactly (bigint ok).
- xsd_time_string (xsd.c:250-955): date / dateTime / time / gYear /
  gYearMonth / gMonthDay / gMonth / gDay with optional timezone,
  BCE years, and validity checks (month/day ranges, leap years).

Used by the node-table query layer for @attr number casts
(xpath.pl:457-461 `number` function) and exposed as vectorized
pandas-UDF-able plain functions.
"""

import re
from typing import Optional, Union

_INT_RE = re.compile(r"[+-]?\d+$")
_FLOAT_RE = re.compile(
    r"[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?$")


def xsd_number(s: str) -> Optional[Union[int, float]]:
    """Parse an XSD number lexical form; None if invalid."""
    if s is None:
        return None
    s = s.strip()
    if not s:
        return None
    if s == "NaN":
        return float("nan")
    if s == "INF" or s == "+INF":
        return float("inf")
    if s == "-INF":
        return float("-inf")
    if _INT_RE.match(s):
        return int(s)
    if _FLOAT_RE.match(s):
        return float(s)
    return None


def xsd_number_canonical(v) -> str:
    """Canonical lexical form (xsd.c output rules: E-notation with
    single leading digit; -0.0 preserved; NaN/INF literal)."""
    if isinstance(v, int):
        return str(v)
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "INF"
    if v == float("-inf"):
        return "-INF"
    m, _, e = ("%.15E" % v).partition("E")
    m = m.rstrip("0")
    if m.endswith("."):
        m += "0"
    return "%sE%d" % (m, int(e))


_TZ = r"(?P<tz>Z|[+-]\d{2}:\d{2})?"
_DATE_RE = re.compile(r"(?P<y>-?\d{4,})-(?P<mo>\d{2})-(?P<d>\d{2})"
                      + _TZ + "$")
_TIME_RE = re.compile(
    r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?P<f>\.\d+)?" + _TZ + "$")
_DATETIME_RE = re.compile(
    r"(?P<y>-?\d{4,})-(?P<mo>\d{2})-(?P<d>\d{2})T"
    r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?P<f>\.\d+)?" + _TZ + "$")
_GYEAR_RE = re.compile(r"(?P<y>-?\d{4,})" + _TZ + "$")
_GYEARMONTH_RE = re.compile(r"(?P<y>-?\d{4,})-(?P<mo>\d{2})" + _TZ + "$")
_GMONTHDAY_RE = re.compile(r"--(?P<mo>\d{2})-(?P<d>\d{2})" + _TZ + "$")
_GMONTH_RE = re.compile(r"--(?P<mo>\d{2})" + _TZ + "$")
_GDAY_RE = re.compile(r"---(?P<d>\d{2})" + _TZ + "$")

_DAYS = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _leap(y):
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def _valid_md(y, mo, d):
    if not 1 <= mo <= 12:
        return False
    maxd = _DAYS[mo - 1] + (1 if mo == 2 and _leap(y) else 0)
    return 1 <= d <= maxd


def _tz_minutes(tz):
    if tz is None:
        return None
    if tz == "Z":
        return 0
    sign = -1 if tz[0] == "-" else 1
    h, m = int(tz[1:3]), int(tz[4:6])
    if h > 14 or m > 59:
        return "invalid"
    return sign * (h * 60 + m)


def xsd_time(s: str, type_: str = None):
    """Parse an XSD date/time lexical form.  Returns a dict of
    components (kind, year, month, day, hour, minute, second,
    fraction, tz_minutes) or None if invalid."""
    if s is None:
        return None
    s = s.strip()
    for kind, rex in (("dateTime", _DATETIME_RE), ("date", _DATE_RE),
                      ("time", _TIME_RE), ("gYearMonth", _GYEARMONTH_RE),
                      ("gYear", _GYEAR_RE), ("gMonthDay", _GMONTHDAY_RE),
                      ("gMonth", _GMONTH_RE), ("gDay", _GDAY_RE)):
        if type_ is not None and type_ != kind:
            continue
        m = rex.match(s)
        if m is None:
            continue
        g = m.groupdict()
        out = {"kind": kind}
        tz = _tz_minutes(g.get("tz"))
        if tz == "invalid":
            return None
        out["tz_minutes"] = tz
        if "y" in g and g["y"] is not None:
            y = int(g["y"])
            if g["y"].lstrip("-").startswith("0") and \
                    len(g["y"].lstrip("-")) > 4:
                return None          # no leading zeros past 4 digits
            out["year"] = y
        if "mo" in g and g["mo"] is not None:
            out["month"] = int(g["mo"])
            if not 1 <= out["month"] <= 12:
                return None
        if "d" in g and g["d"] is not None:
            out["day"] = int(g["d"])
            y = out.get("year", 2000)
            mo = out.get("month", 1)
            if "month" in out and not _valid_md(y, mo, out["day"]):
                return None
            if "month" not in out and not 1 <= out["day"] <= 31:
                return None
        if "h" in g and g["h"] is not None:
            h, mi, sec = int(g["h"]), int(g["mi"]), int(g["s"])
            if h > 24 or mi > 59 or sec > 60:
                return None
            if h == 24 and (mi or sec):
                return None
            out["hour"], out["minute"], out["second"] = h, mi, sec
            out["fraction"] = float(g["f"]) if g.get("f") else 0.0
        return out
    return None
