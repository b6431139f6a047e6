"""Time parsing/formatting parity.

- strptime -> Java DateTimeFormatter translation (the stanza time parser's
  strptime layouts, /root/reference/pkg/stanza/operator/helper/time.go:20-27,
  139-205, which delegates to a ctimefmt-style directive table).
- ClickHouse DateTime64 string format: "yyyy-MM-dd HH:mm:ss" + '.' +
  9-digit zero-padded nanoseconds, UTC
  (/root/reference/exporter/glassflowexporter/internal/formatter/formatter.go:599-607).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strptime directive -> Java DateTimeFormatter pattern.
_STRPTIME_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss",
    "%f": "SSSSSS", "%L": "SSS", "%s": "SSSSSSSSS",
    "%p": "a", "%z": "XX", "%Z": "zzz",
    "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
    "%j": "DDD", "%%": "%",
}


def strptime_to_java(fmt: str) -> str:
    """Translate a strptime layout to a Java DateTimeFormatter pattern."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            d = fmt[i : i + 2]
            if d in _STRPTIME_TO_JAVA:
                out.append(_STRPTIME_TO_JAVA[d])
                i += 2
                continue
            raise ValueError(f"unsupported strptime directive {d!r}")
        # literal chars that are Java pattern letters must be quoted
        c = fmt[i]
        if c.isalpha():
            out.append(f"'{c}'")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def parse_strptime(col: Column, fmt: str) -> Column:
    """time_parser with layout_type=strptime -> TimestampType.

    try_to_timestamp, NOT to_timestamp: under Spark 4 ANSI one string
    that doesn't match the layout aborts the whole job with
    CANNOT_PARSE_TIMESTAMP; the stanza time parser fails that ENTRY
    (on_error semantics key off the resulting NULL)."""
    return F.try_to_timestamp(col, F.lit(strptime_to_java(fmt)))


# the year range every engine (Spark, DuckDB, Go time) formats sanely:
# 0001-01-01T00:00:00Z .. 9999-12-31T23:59:59Z in epoch seconds
_EPOCH_MIN_S = -62135596800
_EPOCH_MAX_S = 253402300799


def parse_epoch(col: Column, layout: str = "s") -> Column:
    """time_parser with layout_type=epoch: s/ms/us/ns (+ s.frac).

    try_cast + year-range gate: a non-numeric value or an epoch mapping
    outside year 1..9999 yields NULL for that entry — ANSI cast raises
    on 'abc' and timestamp_seconds raises 'year out of range' on
    ~1e30, either of which would abort the job."""
    c = col.try_cast("double")
    scale = {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9}[layout]
    sec = c / scale
    return F.when(
        sec.between(F.lit(float(_EPOCH_MIN_S)), F.lit(float(_EPOCH_MAX_S))),
        F.timestamp_seconds(sec),
    )


def epoch_nanos(ts: Column) -> Column:
    """TimestampType -> epoch nanoseconds (long). Spark timestamps are
    microsecond-precision; nanos are micro*1000."""
    return (ts.cast("double") * F.lit(1_000_000)).cast("long") * F.lit(1000)


def clickhouse_ts(ts_nanos: Column) -> Column:
    """Epoch-nanos (long) -> ClickHouse DateTime64(9) string in UTC:
    'yyyy-MM-dd HH:mm:ss.NNNNNNNNN' (9-digit zero-padded nanos), exactly
    formatTimeForClickHouse (formatter.go:599-607)."""
    # exact integer split: `/` on longs is DOUBLE division, and a long
    # near a second boundary (within ~128ns at 2025 epoch magnitudes)
    # rounds up in the long->double cast — floor() then lands one second
    # high and the nanos remainder goes NEGATIVE ('...37.0000000-1').
    # pmod on longs is exact; the quotient divides an exact multiple in
    # decimal, never double.
    nanos = F.pmod(ts_nanos, F.lit(1_000_000_000))
    secs = (
        (ts_nanos - nanos).cast("decimal(38,0)") / F.lit(1_000_000_000)
    ).cast("long")
    base = F.date_format(F.timestamp_seconds(secs), "yyyy-MM-dd HH:mm:ss")
    return F.concat(base, F.lit("."), F.lpad(nanos.cast("string"), 9, "0"))
