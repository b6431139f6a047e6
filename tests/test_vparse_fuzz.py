"""Hypothesis fuzz: the Arrow-native parse fast paths vs their per-row
Python models. These run WITHOUT Spark (pure pyarrow vs python), so
example counts can be high — the integral-double promotion parity bug
was exactly the kind of envelope gap a fuzzer finds and a fixture
battery misses.

Map ordering is not part of the contract (Spark map<string,string>
compares/canonicalizes order-insensitively, as does the driver oracle),
so comparisons go through dict()."""

from __future__ import annotations

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_spark.functions.vparse import (
    _json_one,
    _json_subset_arrow,
    _kv_one,
    _kv_subset_arrow,
    _parse_multiformat_arrow_batch,
    _parse_one,
)

SET = settings(max_examples=120, deadline=None)

_key = st.text(
    alphabet="abkxyz._-é \"\\\t",
    min_size=1,
    max_size=6,
)
_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(10**22), 10**22),  # beyond int64 both ways
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(
        alphabet="abc null NaN 2025-10-10T13:55:36Z \n\r\t\"\\/=0123456789",
        max_size=12,
    ),
)
_value = st.one_of(
    _scalar,
    st.lists(_scalar, max_size=3),
    st.dictionaries(_key, _scalar, max_size=2),
)


@st.composite
def json_body(draw):
    kind = draw(st.integers(0, 9))
    if kind == 0:
        # raw garbage / non-object
        return draw(
            st.text(alphabet='{}[]"null,NaN:0123456789ab \n', max_size=12)
        )
    d = draw(st.dictionaries(_key, _value, max_size=4))
    body = json.dumps(d, ensure_ascii=draw(st.booleans()))
    if kind == 1:
        body = " " + body  # leading whitespace
    elif kind == 2 and len(body) > 2:
        # duplicate a key by raw splice: {"k":1,"k":2}-style
        inner = body[1:-1]
        body = "{" + inner + ("," if inner else "") + inner + "}"
    elif kind == 3:
        body = body + draw(st.sampled_from(["", " ", "x", "\n"]))
    return body


@given(st.lists(json_body(), min_size=1, max_size=8))
@SET
def test_json_fast_path_matches_per_row_model(bodies):
    got = _json_subset_arrow(pa.array(bodies, type=pa.string())).to_pylist()
    for b, g in zip(bodies, got):
        assert (dict(g) if g is not None else None) == _json_one(b), b


@st.composite
def kv_body(draw):
    toks = draw(
        st.lists(
            st.text(alphabet="abk=xyz0123456789._é", max_size=8),
            max_size=6,
        )
    )
    pad_l = draw(st.sampled_from(["", " ", "\t ", " "]))
    pad_r = draw(st.sampled_from(["", " ", "  "]))
    return pad_l + " ".join(toks) + pad_r


@given(st.lists(kv_body(), min_size=1, max_size=8))
@SET
def test_kv_fast_path_matches_per_row_model(bodies):
    got = _kv_subset_arrow(pa.array(bodies, type=pa.string())).to_pylist()
    for b, g in zip(bodies, got):
        assert (dict(g) if g is not None else None) == _kv_one(b), repr(b)


@st.composite
def any_body(draw):
    kind = draw(st.integers(0, 3))
    if kind == 0:
        return draw(json_body())
    if kind == 1:
        return draw(kv_body())
    if kind == 2:
        # apache-ish / containerd-ish / garbage free text
        return draw(
            st.text(
                alphabet='10.2.3 - u [2025] "GET /x" 200 abc=\n{}',
                max_size=40,
            )
        )
    return None


@given(
    st.lists(
        st.tuples(any_body(), st.one_of(st.none(), st.integers(0, 4))),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_multiformat_dispatch_matches_per_row_model(rows):
    bodies = pa.array([b for b, _ in rows], type=pa.string())
    fmts = pa.array([f for _, f in rows], type=pa.int32())
    got = _parse_multiformat_arrow_batch(bodies, fmts).to_pylist()
    for (b, f), g in zip(rows, got):
        assert (dict(g) if g is not None else None) == _parse_one(b, f), (b, f)


def test_anchor_rewrite_only_touches_trailing_dollar():
    # the canonical-pattern anchor rewrite must only rewrite a single
    # unescaped trailing '$'; an escaped \$ or a mid-pattern '$' must
    # raise loudly instead of silently changing meaning (ADVICE r4)
    from opentelemetry_collector_contrib_spark.functions import vparse as V

    assert V.java_pattern(r"^a\S+$") == r"^a\S+\z"
    assert V.java_pattern(r"^a b") == r"^a b"  # unanchored: unchanged
    assert V._py_rx(r"^cost \$5$").match("cost $5\n") is None
    assert V._py_rx(r"^cost \$5$").match("cost $5") is not None
    for bad in (r"^a$ b$", r"price [$] end$", r"mid$dle"):
        try:
            V.java_pattern(bad)
        except ValueError:
            pass
        else:
            raise AssertionError(f"expected ValueError for {bad!r}")
