"""OTTL XML converter family as Arrow-batched pandas UDFs.

Reference: /root/reference/pkg/ottl/ottlfuncs/func_get_xml.go,
func_insert_xml.go, func_remove_xml.go, func_parse_xml.go,
func_parse_simplified_xml.go, func_convert_text_to_elements_xml.go,
func_convert_attributes_to_elements_xml.go; expected outputs mirror the
e2e corpus (/root/reference/pkg/ottl/e2e/e2e_test.go:592-604,720,750,
979-1008).

XML work is irreducibly tree-shaped, so this family runs as pandas UDFs
(Arrow batches, regex/ElementTree compiled per worker — never per-row
Python UDFs). Everything else in the OTTL surface stays JVM-side; configs
that don't touch XML pay nothing for this module.

Supported XPath subset (validated against the reference corpus):
absolute paths, `/` child and `//` descendant axes, `*` wildcard,
final-step `@attr` / `text()` selection, and `[@attr='v']` predicates.
The reference uses antchfx/xmlquery (full XPath); unsupported syntax
raises ValueError at plan time, not silently at run time.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_STEP_RX = re.compile(
    r"^(?P<name>\*|[A-Za-z_][\w.\-]*|@[A-Za-z_][\w.\-]*|text\(\))"
    r"(?:\[@(?P<pk>[\w.\-]+)='(?P<pv>[^']*)'\])?$"
)


def _tokenize_xpath(xpath: str) -> list[tuple[bool, str, tuple[str, str] | None]]:
    """-> [(descendant_axis, step_name, (pred_key, pred_val) | None)]"""
    if not xpath.startswith("/"):
        raise ValueError(f"only absolute XPaths supported, got {xpath!r}")
    out = []
    i = 0
    n = len(xpath)
    while i < n:
        desc = False
        if xpath.startswith("//", i):
            desc, i = True, i + 2
        elif xpath.startswith("/", i):
            i += 1
        j = xpath.find("/", i)
        # don't split inside a [...] predicate
        br = xpath.find("[", i)
        if br != -1 and (j == -1 or br < j):
            close = xpath.find("]", br)
            j = xpath.find("/", close)
        step = xpath[i:] if j == -1 else xpath[i:j]
        m = _STEP_RX.match(step)
        if not m:
            raise ValueError(f"unsupported XPath step {step!r} in {xpath!r}")
        pred = (m.group("pk"), m.group("pv")) if m.group("pk") else None
        out.append((desc, m.group("name"), pred))
        i = n if j == -1 else j
    return out


def _parse_fragment(text: str) -> ET.Element | None:
    """Parse a document OR a multi-root fragment under a synthetic root.
    Malformed XML (even a bare '&') returns None — a per-record NULL,
    matching the reference's per-record OTTL error handled by error
    mode; an uncaught ParseError inside a pandas UDF would abort the
    WHOLE job on one bad row."""
    try:
        return ET.fromstring(f"<__r__>{text}</__r__>")
    except ET.ParseError:
        return None


def _step_matches(el: ET.Element, name: str, pred) -> bool:
    if name == "*":
        ok = True
    elif name.startswith("@") or name == "text()":
        return False  # element position can't match an attr/text step
    else:
        ok = el.tag == name
    if ok and pred is not None:
        ok = el.get(pred[0]) == pred[1]
    return ok


def _find(root: ET.Element, steps, idx=0, out=None, parents=None, parent=None):
    """Collect matches as (parent, node, kind) where kind is
    'elem' | ('attr', name) | 'text'."""
    if out is None:
        out, parents = [], {}
    desc, name, pred = steps[idx]
    last = idx == len(steps) - 1

    def visit(el, par):
        if name.startswith("@"):
            return  # attribute steps are handled by the parent element step
        if _step_matches(el, name, pred):
            if last:
                out.append((par, el, "elem"))
            else:
                ndesc, nname, npred = steps[idx + 1]
                if nname.startswith("@"):
                    if len(steps) - 1 == idx + 1 and el.get(nname[1:]) is not None:
                        out.append((el, None, ("attr", nname[1:])))
                elif nname == "text()":
                    if len(steps) - 1 == idx + 1 and (el.text or "").strip():
                        out.append((el, None, "text"))
                else:
                    _find(el, steps, idx + 1, out, parents, el)
        if desc:
            for c in list(el):
                visit(c, el)

    for child in list(root):
        visit(child, root)
    return out


def _serialize(el: ET.Element) -> str:
    """Reference-parity serializer: explicit end tags (never `<b />`),
    attributes in document order."""
    attrs = "".join(f" {k}={quoteattr(v)}" for k, v in el.attrib.items())
    inner = escape(el.text) if el.text else ""
    for c in list(el):
        inner += _serialize(c)
        if c.tail:
            inner += escape(c.tail)
    return f"<{el.tag}{attrs}>{inner}</{el.tag}>"


def _serialize_fragment(root: ET.Element) -> str:
    out = escape(root.text) if root.text else ""
    for c in list(root):
        out += _serialize(c)
        if c.tail:
            out += escape(c.tail)
    return out


def _get_xml_one(doc: str, steps) -> str | None:
    if doc is None:
        return None
    if doc == "":
        return ""
    root = _parse_fragment(doc)
    if root is None:
        return None
    parts = []
    for par, node, kind in _find(root, steps):
        if kind == "elem":
            parts.append(_serialize(node))
        elif kind == "text":
            parts.append(par.text or "")
        else:  # attr
            parts.append(par.get(kind[1], ""))
    return "".join(parts)


def _remove_xml_one(doc: str, steps) -> str | None:
    if doc is None:
        return None
    root = _parse_fragment(doc)
    if root is None:
        return None
    for par, node, kind in _find(root, steps):
        if kind == "elem":
            # preserve the removed node's tail text on the previous sibling
            kids = list(par)
            i = kids.index(node)
            tail = node.tail or ""
            if tail:
                if i > 0:
                    kids[i - 1].tail = (kids[i - 1].tail or "") + tail
                else:
                    par.text = (par.text or "") + tail
            par.remove(node)
        elif kind == "text":
            par.text = None
        else:
            par.attrib.pop(kind[1], None)
    return _serialize_fragment(root)


def _insert_xml_one(doc: str, steps, sub: str) -> str | None:
    if doc is None or sub is None:
        return None
    root = _parse_fragment(doc)
    if root is None:
        return None
    for _, node, kind in _find(root, steps):
        if kind != "elem":
            continue
        subroot = _parse_fragment(sub)
        if subroot is None:
            return None
        for c in list(subroot):
            c.tail = None
            node.append(c)
    return _serialize_fragment(root)


def _element_to_plain(el: ET.Element) -> dict:
    """ParseXML shape (func_parse_xml.go): {tag, attributes?, content?,
    children?}."""
    out: dict = {"tag": el.tag}
    if el.attrib:
        out["attributes"] = dict(el.attrib)
    text = (el.text or "").strip()
    if text:
        out["content"] = text
    kids = [_element_to_plain(c) for c in list(el)]
    if kids:
        out["children"] = kids
    return out


def _simplified(el: ET.Element):
    """ParseSimplifiedXML (func_parse_simplified_xml.go parseElement):
    attributes and stray text dropped; repeated tags become lists."""
    counts: dict[str, int] = {}
    for c in list(el):
        counts[c.tag] = counts.get(c.tag, 0) + 1
    if not counts:
        return None
    out: dict = {}
    for c in list(el):
        child_val = _simplified(c)
        if child_val is None:
            child_val = (c.text or "").strip()
        if counts[c.tag] > 1:
            if child_val != "" and child_val is not None:
                out.setdefault(c.tag, []).append(child_val)
        else:
            out[c.tag] = child_val
    return out


def _flatten(prefix: str, val, out: dict):
    if isinstance(val, dict):
        for k, v in val.items():
            _flatten(f"{prefix}.{k}" if prefix else k, v, out)
    elif isinstance(val, list):
        for i, v in enumerate(val):
            _flatten(f"{prefix}.{i}", v, out)
    else:
        out[prefix] = "" if val is None else str(val)


def _convert_text_one(doc: str, steps, element_name: str) -> str | None:
    """ConvertTextToElementsXML: wrap stray text content of matched
    elements (and their descendants? no — matched elements only) into
    <element_name> children at the text's position."""
    if doc is None:
        return None
    root = _parse_fragment(doc)
    if root is None:
        return None
    targets = (
        [n for _, n, k in _find(root, steps) if k == "elem"]
        if steps
        else [c for c in root.iter() if c is not root]
    )
    for el in targets:
        kids = list(el)
        if not kids:
            continue  # leaf text is already element content
        if (el.text or "").strip():
            wrap = ET.Element(element_name)
            wrap.text = el.text.strip()
            el.text = None
            el.insert(0, wrap)
            kids = list(el)
        pos = 0
        for c in kids:
            pos = list(el).index(c)
            if (c.tail or "").strip():
                wrap = ET.Element(element_name)
                wrap.text = c.tail.strip()
                c.tail = None
                el.insert(pos + 1, wrap)
    return _serialize_fragment(root)


def _convert_attrs_one(doc: str) -> str | None:
    """ConvertAttributesToElementsXML: every attribute becomes a child
    element (appended after existing children), removed from the tag."""
    if doc is None:
        return None
    root = _parse_fragment(doc)
    if root is None:
        return None
    for el in list(root.iter()):
        if el is root:
            continue
        for k in list(el.attrib):
            child = ET.Element(k)
            child.text = el.attrib.pop(k)
            el.append(child)
    return _serialize_fragment(root)


# ---------------------------------------------------------------------------
# Column factories (xpath validated at plan time on the driver)
# ---------------------------------------------------------------------------


def get_xml(col: Column, xpath: str) -> Column:
    steps = _tokenize_xpath(xpath)

    @pandas_udf(T.StringType())
    def _u(s: pd.Series) -> pd.Series:
        return s.map(lambda d: _get_xml_one(d, steps), na_action="ignore")

    return _u(col)


def remove_xml(col: Column, xpath: str) -> Column:
    steps = _tokenize_xpath(xpath)

    @pandas_udf(T.StringType())
    def _u(s: pd.Series) -> pd.Series:
        return s.map(lambda d: _remove_xml_one(d, steps), na_action="ignore")

    return _u(col)


def insert_xml(col: Column, xpath: str, sub: Column) -> Column:
    steps = _tokenize_xpath(xpath)

    @pandas_udf(T.StringType())
    def _u(s: pd.Series, subs: pd.Series) -> pd.Series:
        return pd.Series(
            [_insert_xml_one(d, steps, sd) for d, sd in zip(s, subs)], dtype=object
        )

    return _u(col, sub)


def parse_xml_json(col: Column) -> Column:
    """ParseXML -> the reference's nested structure as a JSON string
    (the flat model's stand-in for a nested pcommon.Map)."""
    import json

    @pandas_udf(T.StringType())
    def _u(s: pd.Series) -> pd.Series:
        def one(d):
            root = _parse_fragment(d)
            if root is None:
                return None
            kids = list(root)
            if not kids:
                return None
            return json.dumps(_element_to_plain(kids[0]), separators=(",", ":"))

        return s.map(one, na_action="ignore")

    return _u(col)


def parse_simplified_xml(col: Column) -> Column:
    """ParseSimplifiedXML -> map<string,string> with dotted-path keys
    ('Log.id' -> '1'; repeated tags indexed 'Log.Test.0')."""

    @pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def _u(s: pd.Series) -> pd.Series:
        def one(d):
            root = _parse_fragment(d)
            if root is None:
                return None
            simp = _simplified(root) or {}
            flat: dict = {}
            _flatten("", simp, flat)
            return flat

        return s.map(one, na_action="ignore")

    return _u(col)


def convert_text_to_elements_xml(
    col: Column, xpath: str | None = None, element_name: str = "value"
) -> Column:
    steps = _tokenize_xpath(xpath) if xpath else None

    @pandas_udf(T.StringType())
    def _u(s: pd.Series) -> pd.Series:
        return s.map(lambda d: _convert_text_one(d, steps, element_name), na_action="ignore")

    return _u(col)


def convert_attributes_to_elements_xml(col: Column) -> Column:
    @pandas_udf(T.StringType())
    def _u(s: pd.Series) -> pd.Series:
        return s.map(_convert_attrs_one, na_action="ignore")

    return _u(col)
