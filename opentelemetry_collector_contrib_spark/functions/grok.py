"""Grok pattern expansion + vectorized extraction.

OTTL ``ExtractGrokPatterns`` (/root/reference/pkg/ottl/ottlfuncs/
func_extract_grok_patterns.go:18-101) compiles a grok expression (with the
elastic/go-grok default pattern set and optional custom ``NAME=regex``
definitions) once at plan time, then extracts named captures per record.

Here: grok -> plain regex expansion happens on the driver at plan time;
extraction is either
- ``impl='jvm'``: one ``regexp_extract`` per named group (whole-stage
  codegen, zero Python), or
- ``impl='pandas'``: a single Arrow-batched pandas UDF with the compiled
  regex returning map<string,string> (one pass per row; preferred when the
  pattern has many groups).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Core default patterns (subset of the go-grok/logstash default set with the
# same names & semantics).
DEFAULT_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "NUMBER": r"(?:%{BASE10NUM})",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r'(?:"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\')',
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IP": r"%{IPV4}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "MONTH": r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\b",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{ISO8601_TIMEZONE}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "COMMONAPACHELOG": r'%{IPORHOST:source_address} %{USER:apache_ident} %{USER:user_name} \[%{HTTPDATE:timestamp}\] "(?:%{WORD:http_request_method} %{NOTSPACE:url_original}(?: HTTP/%{NUMBER:http_version})?|%{DATA})" %{INT:http_response_status_code} (?:%{INT:http_response_body_bytes}|-)',
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(int|long|float|double|string|boolean))?\}")


def expand(pattern: str, custom: dict[str, str] | None = None, depth: int = 0) -> str:
    """Expand %{NAME[:capture[:type]]} references into a plain regex with
    named groups. Capture names have non-word chars mapped to '_' (regex
    group-name restrictions; same normalization the go library applies)."""
    if depth > 20:
        raise ValueError("grok pattern recursion too deep")
    defs = {**DEFAULT_PATTERNS, **(custom or {})}

    def sub(m: re.Match) -> str:
        name, capture, _typ = m.group(1), m.group(2), m.group(3)
        if name not in defs:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        inner = expand(defs[name], custom, depth + 1)
        if capture:
            safe = re.sub(r"\W", "_", capture)
            return f"(?P<{safe}>{inner})"
        return f"(?:{inner})"

    return _GROK_REF.sub(sub, pattern)


def grok_extract(
    col: Column,
    pattern: str,
    custom: dict[str, str] | None = None,
    impl: str = "pandas",
) -> Column:
    """ExtractGrokPatterns -> map<string,string> of named captures
    (unmatched rows -> empty map; named-captures-only semantics)."""
    rx = expand(pattern, custom)
    names = re.findall(r"\(\?P<(\w+)>", rx)
    if impl == "jvm":
        # delegate to extract_patterns: strips group names (Java group-name
        # charset is narrower than grok capture names) and extracts by index
        from .ottl import extract_patterns

        return extract_patterns(col, rx)
    _ = names

    compiled_src = rx

    @pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def _extract(s: pd.Series) -> pd.Series:
        crx = re.compile(compiled_src)

        def one(v):
            if v is None:
                return None
            m = crx.search(v)
            if not m:
                return {}
            return {k: val for k, val in m.groupdict().items() if val is not None}

        return s.map(one)

    return _extract(col)
