"""Shared regex plumbing: named-group stripping + capturing-group index
mapping for handing Python-authored patterns to JVM regexp_* functions
(Java group names reject '_', '.', '@'; extraction is by index instead).

One implementation for ottl.extract_patterns and grok.grok_extract — the
walker tracks escapes with a real state machine (any run of backslashes,
not a two-char lookback) and treats '(' inside [...] character classes as
the literal it is.
"""

from __future__ import annotations


def strip_named_groups(rx: str) -> tuple[str, list[tuple[int, str]]]:
    """-> (pattern with named groups converted to plain capturing groups,
    [(capturing_group_index_1_based, group_name), ...] in order).

    Handles (?P<name>...) and (?<name>...); lookbehinds (?<= (?<! are left
    untouched. Non-capturing (?:...), lookaheads, and flags groups are
    skipped for index counting."""
    out: list[str] = []
    names: list[tuple[int, str]] = []
    gi = 0
    i = 0
    n = len(rx)
    in_class = False
    escaped = False
    while i < n:
        ch = rx[i]
        if escaped:
            out.append(ch)
            escaped = False
            i += 1
            continue
        if ch == "\\":
            out.append(ch)
            escaped = True
            i += 1
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
            i += 1
            continue
        if ch == "[":
            in_class = True
            out.append(ch)
            i += 1
            continue
        if ch == "(":
            is_named = (
                rx.startswith("(?P<", i)
                or (
                    rx.startswith("(?<", i)
                    and not rx.startswith("(?<=", i)
                    and not rx.startswith("(?<!", i)
                )
            )
            if is_named:
                gi += 1
                end = rx.index(">", i)
                start = i + (4 if rx.startswith("(?P<", i) else 3)
                names.append((gi, rx[start:end]))
                out.append("(")
                i = end + 1
                continue
            if not rx.startswith("(?", i):
                gi += 1
            out.append(ch)
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out), names
