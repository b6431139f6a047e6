"""OTTL statement mini-grammar: parse the reference's statement strings
into Spark Column pipelines.

The reference parses `editor(args...) [where condition]` with a PEG
grammar into per-record interpreter closures
(/root/reference/pkg/ottl/parser.go:347-361, grammar.go:15-34). Here the
same surface compiles — once, on the driver — to Catalyst expressions, so
a transformprocessor YAML statement like

    set(attributes["env"], "prod") where severity_number >= 17

runs as `F.when(cond, map_edit).otherwise(keep)` with zero per-row
interpretation. Supported surface (the subset the transform/filter/routing
processors exercise; LANGUAGE.md:1-291):

- paths: body, severity_number, severity_text, trace_id, span_id,
  attributes["k"], resource.attributes["k"] (any map col via dotted name)
- literals: "str", 123, 1.5, true, false, nil
- editors: set, delete_key, delete_matching_keys, keep_keys,
  keep_matching_keys, truncate_all, limit, replace_pattern,
  replace_all_patterns, merge_maps, append
- converters: Concat, Int, Double, String, SHA1, SHA256, MD5, Len,
  ToUpperCase, ToLowerCase, Substring, Split, Trim, TrimPrefix,
  TrimSuffix, IsMatch, ParseJSON, ParseKeyValue, ExtractPatterns,
  UUID, Hex, Unhex
- conditions: ==, !=, >, >=, <, <=, and, or, not(), parentheses,
  `where` clause; math + - * / on numeric terms
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import ottl

_TOKEN_RX = re.compile(
    r"""
    (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<float>-?\d+\.\d+)
  | (?P<int>-?\d+)
  | (?P<op><=|>=|==|!=|<|>|\+|-|\*|/)
  | (?P<lbracket>\[)
  | (?P<rbracket>\])
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<ws>\s+)
    """,
    re.VERBOSE,
)


_ESCAPES = {'"': '"', "\\": "\\", "n": "\n", "t": "\t", "r": "\r"}


def _unescape(s: str) -> str:
    """Unescape \\" \\\\ \\n \\t \\r without mangling non-ASCII text
    (unicode_escape would reinterpret UTF-8 bytes as Latin-1)."""
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(_ESCAPES.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


_KEYWORDS = {"and", "or", "not", "where"}

# token kinds that can END an operand — a '-'+digits right after one of
# these is a binary minus, not a sign
_OPERAND_END = {"int", "float", "string", "rbracket", "rparen"}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RX.match(src, i)
        if not m:
            raise ValueError(f"OTTL syntax error at {src[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        # the regex greedily lexes '-1' as a negative literal even in
        # `Len(body)-1`, which would leave [rparen, int] with no operator
        # and fail the whole statement — re-split into binary minus +
        # positive literal when the previous token ends an operand
        if (
            kind in ("int", "float")
            and val.startswith("-")
            and out
            and (
                out[-1][0] in _OPERAND_END
                or (out[-1][0] == "ident" and out[-1][1] not in _KEYWORDS)
            )
        ):
            out.append(("op", "-"))
            val = val[1:]
        out.append((kind, val))
    out.append(("eof", ""))
    return out


# converter name -> Column function
def _concat(args):
    # OTTL: Concat([vals...], delimiter) -> concat_ws(delimiter, *vals)
    vals, delim = args[0], _lit_str(args[1])
    if not isinstance(vals, list):
        vals = [vals]
    return ottl.concat_(delim, *[_to_col(v) for v in vals])


def _converters():
    return {
        "Concat": _concat,
        "Int": lambda a: ottl.int_(a[0]),
        "Double": lambda a: ottl.double_(a[0]),
        "String": lambda a: ottl.string_(a[0]),
        "SHA1": lambda a: F.sha1(a[0]),
        "SHA256": lambda a: ottl.sha256_(a[0]),
        "SHA512": lambda a: ottl.sha512_(a[0]),
        "MD5": lambda a: F.md5(a[0]),
        "Len": lambda a: ottl.len_(a[0]),
        "ToUpperCase": lambda a: F.upper(a[0]),
        "ToLowerCase": lambda a: F.lower(a[0]),
        "Substring": lambda a: F.substring(a[0], _lit_int(a[1]) + 1, _lit_int(a[2])),
        "Split": lambda a: F.split(a[0], re.escape(_lit_str(a[1]))),
        "Trim": lambda a: ottl.trim_(a[0]),
        "TrimPrefix": lambda a: ottl.trim_prefix(a[0], _lit_str(a[1])),
        "TrimSuffix": lambda a: ottl.trim_suffix(a[0], _lit_str(a[1])),
        "IsMatch": lambda a: ottl.is_match(a[0], _lit_str(a[1])),
        "ParseJSON": lambda a: ottl.parse_json_(a[0]),
        "ParseKeyValue": lambda a: ottl.parse_key_value(a[0]),
        "ExtractPatterns": lambda a: ottl.extract_patterns(a[0], _lit_str(a[1])),
        "UUID": lambda a: ottl.uuid_(),
        "Hex": lambda a: F.hex(a[0]),
        "Unhex": lambda a: F.unhex(a[0]),
        # round-2 additions (functions.go registry parity)
        "UserAgent": lambda a: ottl.user_agent(a[0]),
        "IsValidLuhn": lambda a: ottl.is_valid_luhn(a[0]),
        "Decode": lambda a: ottl.decode_(
            F.lit(a[0]) if isinstance(a[0], str) else a[0], _lit_str(a[1])
        ),
        "FNV": lambda a: ottl.fnv1a64(a[0]),
        "XXH64": lambda a: ottl.xxh64(a[0]),
        "GetXML": lambda a: _xml().get_xml(a[0], _lit_str(a[1])),
        "RemoveXML": lambda a: _xml().remove_xml(a[0], _lit_str(a[1])),
        "InsertXML": lambda a: _xml().insert_xml(a[0], _lit_str(a[1]), _to_col(a[2])),
        "ParseXML": lambda a: _xml().parse_xml_json(a[0]),
        "ParseSimplifiedXML": lambda a: _xml().parse_simplified_xml(a[0]),
        "ConvertTextToElementsXML": lambda a: _xml().convert_text_to_elements_xml(
            a[0],
            _lit_str(a[1]) if len(a) > 1 else None,
            _lit_str(a[2]) if len(a) > 2 else "value",
        ),
        "ConvertAttributesToElementsXML": lambda a: _xml().convert_attributes_to_elements_xml(a[0]),
        # string family
        "Format": lambda a: F.format_string(_lit_str(a[0]), *[_to_col(x) for x in a[1]]),
        "ToSnakeCase": lambda a: ottl.to_snake_case(a[0]),
        "ToCamelCase": lambda a: ottl.to_camel_case(a[0]),
        "HasPrefix": lambda a: ottl.has_prefix(a[0], _lit_str(a[1])),
        "HasSuffix": lambda a: ottl.has_suffix(a[0], _lit_str(a[1])),
        "ToKeyValueString": lambda a: ottl.to_key_value_string(
            a[0],
            _lit_str(a[1]) if len(a) > 1 else "=",
            _lit_str(a[2]) if len(a) > 2 else " ",
        ),
        "ParseCSV": lambda a: ottl.parse_csv_(a[0], [_lit_str(h) for h in a[1]]),
        "URL": lambda a: ottl.url_(a[0]),
        "Base64Decode": lambda a: ottl.base64_decode(a[0]),
        # time family
        "Time": lambda a: ottl.time_(a[0], _lit_str(a[1])),
        "FormatTime": lambda a: ottl.format_time(a[0], _lit_str(a[1])),
        "TruncateTime": lambda a: ottl.truncate_time(a[0], _lit_str(a[1])),
        "UnixSeconds": lambda a: ottl.unix_seconds(a[0]),
        "UnixMilli": lambda a: ottl.unix_milli(a[0]),
        "UnixMicro": lambda a: ottl.unix_micro(a[0]),
        "UnixNano": lambda a: ottl.unix_nano(a[0]),
        "Now": lambda a: ottl.now_(),
        "Year": lambda a: ottl.year_(a[0]),
        "Month": lambda a: ottl.month_(a[0]),
        "Day": lambda a: ottl.day_(a[0]),
        "Weekday": lambda a: ottl.weekday_(a[0]),
        "Hour": lambda a: ottl.hour_(a[0]),
        "Minute": lambda a: ottl.minute_(a[0]),
        "Second": lambda a: ottl.second_(a[0]),
        # reference arity is ZERO args (random v7 from the wall clock);
        # the 2-arg (ts, entropy) form is this engine's reproducible
        # variant — support both so verbatim configs compile
        "UUIDv7": lambda a: (
            ottl.uuid_v7(
                F.unix_millis(F.current_timestamp()), F.expr("uuid()")
            )
            if not a
            else ottl.uuid_v7(_to_col(a[0]), _to_col(a[1]))
        ),
        # type / collection family
        "IsString": lambda a: ottl.is_string(a[0]),
        "ContainsValue": lambda a: ottl.contains_value(a[0], _to_col(a[1])),
        "Keys": lambda a: ottl.keys_(a[0]),
        "Values": lambda a: ottl.values_(a[0]),
        "Sort": lambda a: ottl.sort_(a[0]),
        "SliceToMap": lambda a: ottl.slice_to_map(a[0]),
        "Log": lambda a: F.log(_to_col(a[0])),
        # round-3 additions (remaining functions.go registry gaps)
        "Duration": lambda a: ottl.duration_(
            F.lit(a[0]) if isinstance(a[0], str) else a[0]
        ),
        "Hours": lambda a: ottl.hours_(a[0]),
        "Minutes": lambda a: ottl.minutes_(a[0]),
        "Seconds": lambda a: ottl.seconds_(a[0]),
        "Milliseconds": lambda a: ottl.milliseconds_(a[0]),
        "Microseconds": lambda a: ottl.microseconds_(a[0]),
        "Nanoseconds": lambda a: ottl.nanoseconds_(a[0]),
        "IsBool": lambda a: ottl.is_bool(_to_col(a[0])),
        "IsInt": lambda a: ottl.is_int(_to_col(a[0])),
        "IsDouble": lambda a: ottl.is_double(_to_col(a[0])),
        "IsList": lambda a: ottl.is_list(_to_col(a[0])),
        "IsMap": lambda a: ottl.is_map(_to_col(a[0])),
        "ParseInt": lambda a: ottl.parse_int(
            F.lit(a[0]) if isinstance(a[0], str) else a[0],
            _lit_int(a[1]) if len(a) > 1 else 10,
        ),
        "ConvertCase": lambda a: ottl.convert_case(a[0], _lit_str(a[1])),
        "SpanID": lambda a: ottl.span_id_(
            F.lit(a[0]) if isinstance(a[0], str) else a[0]
        ),
        "TraceID": lambda a: ottl.trace_id_(
            F.lit(a[0]) if isinstance(a[0], str) else a[0]
        ),
        "ProfileID": lambda a: ottl.profile_id_(
            F.lit(a[0]) if isinstance(a[0], str) else a[0]
        ),
        "ExtractGrokPatterns": _extract_grok,
        "Murmur3Hash": lambda a: ottl.murmur3_hash_exact(a[0]),
        "Murmur3Hash128": lambda a: ottl.murmur3_hash128_exact(a[0]),
        "Index": lambda a: ottl.index_(_to_col(a[0]), _to_col(a[1])),
        "Nanosecond": lambda a: ottl.nanosecond_(a[0]),
        "Unix": lambda a: ottl.unix_(
            _to_col(a[0]), _to_col(a[1]) if len(a) > 1 else None
        ),
        "XXH3": lambda a: ottl.xxh3_(a[0]),
        "XXH128": lambda a: ottl.xxh128_(a[0]),
    }


def _extract_grok(args):
    """ExtractGrokPatterns(target, pattern[, namedCapturesOnly[,
    pattern_definitions]]) — func_extract_grok_patterns.go."""
    from .grok import grok_extract, parse_definitions

    target = args[0]
    pattern = _lit_str(args[1])
    named_only = args[2] if len(args) > 2 else True
    if not isinstance(named_only, bool):
        raise ValueError("ExtractGrokPatterns namedCapturesOnly must be a bool")
    defs = None
    if len(args) > 3:
        defs = parse_definitions([_lit_str(d) for d in args[3]])
    return grok_extract(target, pattern, custom=defs, named_captures_only=named_only)


def _xml():
    from . import xmlfuncs

    return xmlfuncs


def _lit_str(c) -> str:
    if not isinstance(c, str):
        raise ValueError(f"expected string literal, got {c}")
    return c


def _lit_int(c) -> int:
    if not isinstance(c, int):
        raise ValueError(f"expected int literal, got {c}")
    return c


@dataclass
class _Path:
    """A settable path: top-level column or map key."""

    col: str
    key: str | None

    def get(self) -> Column:
        if self.key is None:
            return F.col(self.col)
        return F.element_at(F.col(self.col), self.key)


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.pos = 0
        self.convs = _converters()

    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind: str):
        t = self.next()
        if t[0] != kind:
            raise ValueError(f"expected {kind}, got {t}")
        return t

    # term := literal | path | Converter(args) | ( expr )
    def term(self):
        kind, val = self.peek()
        if kind == "string":
            self.next()
            return _unescape(val[1:-1])
        if kind == "int":
            self.next()
            return int(val)
        if kind == "float":
            self.next()
            return float(val)
        if kind == "lparen":
            self.next()
            e = self.expr()
            self.expect("rparen")
            return e
        if kind == "ident":
            self.next()
            if val in ("true", "false"):
                return val == "true"
            if val in ("nil", "null"):
                return None
            nk, _ = self.peek()
            if nk == "lparen" and val in self.convs:
                raw = self.args()
                # paths become Columns; literal strings/ints stay raw so
                # converter signatures can take patterns/lengths verbatim
                cooked = [a.get() if isinstance(a, _Path) else a for a in raw]
                res = self.convs[val](cooked)
                # OTTL indexable converter results: UserAgent(x)["os.name"],
                # Split(x, ",")[0] (LANGUAGE.md: slice indices are 0-based;
                # Spark element_at is 1-based for arrays)
                while self.peek()[0] == "lbracket":
                    self.next()
                    key = self.term()
                    self.expect("rbracket")
                    if isinstance(key, int):
                        res = F.element_at(res, key + 1)
                    else:
                        res = F.element_at(res, _lit_str(key))
                return res
            if nk == "lbracket":  # path with map key: attributes["k"]
                self.next()
                key = _lit_str(self.term())
                self.expect("rbracket")
                return _Path(val.replace("resource.attributes", "resource_attributes"), key)
            return _Path(val.replace("resource.attributes", "resource_attributes"), None)
        raise ValueError(f"unexpected token {self.peek()}")

    def _arg(self):
        if self.peek()[0] == "lbracket":  # list literal [a, b, ...]
            self.next()
            lst = []
            while self.peek()[0] != "rbracket":
                lst.append(self.expr())
                if self.peek()[0] == "comma":
                    self.next()
            self.expect("rbracket")
            return lst
        return self.expr()

    def args(self) -> list:
        self.expect("lparen")
        out = []
        if self.peek()[0] != "rparen":
            out.append(self._arg())
            while self.peek()[0] == "comma":
                self.next()
                out.append(self._arg())
        self.expect("rparen")
        return out

    # muldiv := term (('*'|'/') term)*  — binds tighter, per LANGUAGE.md
    def muldiv(self):
        left = self.term()
        while self.peek() in (("op", "*"), ("op", "/")):
            _, op = self.next()
            right = self.term()
            lc, rc = _to_col(left), _to_col(right)
            left = lc * rc if op == "*" else lc / rc
        return left

    # expr := muldiv (('+'|'-') muldiv)*
    def expr(self):
        left = self.muldiv()
        while self.peek() in (("op", "+"), ("op", "-")):
            _, op = self.next()
            right = self.muldiv()
            lc, rc = _to_col(left), _to_col(right)
            left = lc + rc if op == "+" else lc - rc
        return left

    # comparison := expr (cmp expr)?
    def comparison(self) -> Column:
        left = self.expr()
        kind, val = self.peek()
        if kind == "op" and val in ("==", "!=", ">", ">=", "<", "<="):
            self.next()
            right = self.expr()
            lc, rc = _to_col(left), _to_col(right)
            return {
                "==": lc == rc, "!=": lc != rc, ">": lc > rc,
                ">=": lc >= rc, "<": lc < rc, "<=": lc <= rc,
            }[val]
        return _to_col(left).cast("boolean")

    # bool := comparison | not(...) | bool and bool | bool or bool
    def boolean(self) -> Column:
        def unit() -> Column:
            kind, val = self.peek()
            if kind == "ident" and val == "not":
                self.next()
                self.expect("lparen")
                inner = self.boolean()
                self.expect("rparen")
                return ~inner
            if kind == "lparen":
                # '(' is ambiguous: boolean grouping or parenthesized
                # arithmetic like (x + 1) > 3 — try boolean grouping and
                # backtrack to a comparison if that doesn't consume cleanly
                saved = self.pos
                try:
                    self.next()
                    inner = self.boolean()
                    self.expect("rparen")
                    nk, nv = self.peek()
                    if nk == "op":  # trailing comparison/math: not a group
                        raise ValueError("not a boolean group")
                    del nv
                    return inner
                except ValueError:
                    self.pos = saved
                    return self.comparison()
            return self.comparison()

        # OTTL precedence (grammar.go): 'and' binds tighter than 'or' —
        # `a or b and c` is `a or (b and c)`; a flat left-to-right fold
        # would build `(a or b) and c` and silently select the wrong rows
        def and_expr():
            left = unit()
            while True:
                kind, val = self.peek()
                if kind == "ident" and val == "and":
                    self.next()
                    left = left & unit()
                else:
                    return left

        left = and_expr()
        while True:
            kind, val = self.peek()
            if kind == "ident" and val == "or":
                self.next()
                left = left | and_expr()
            else:
                return left


def _to_col(v) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, _Path):
        return v.get()
    return F.lit(v)


@dataclass
class Statement:
    """One parsed OTTL statement: apply(df) executes editor-where on a
    flat log-record DataFrame."""

    editor: str
    args: list
    condition: Column | None
    source: str

    def apply(self, df: DataFrame) -> DataFrame:
        e, a, cond = self.editor, self.args, self.condition

        def edit_map(col_name: str, new_map: Column) -> DataFrame:
            final = new_map if cond is None else F.when(cond, new_map).otherwise(F.col(col_name))
            return df.withColumn(col_name, final)

        if e == "set":
            target = a[0]
            value = _to_col(a[1])
            if isinstance(target, _Path) and target.key is not None:
                return edit_map(target.col, ottl.set_key(F.col(target.col), target.key, value.cast("string")))
            if isinstance(target, _Path):
                final = value if cond is None else F.when(cond, value).otherwise(F.col(target.col))
                return df.withColumn(target.col, final)
            raise ValueError("set target must be a path")
        if e == "delete_key":
            t = a[0]
            return edit_map(t.col, ottl.delete_key(F.col(t.col), _lit_str(a[1])))
        if e == "delete_matching_keys":
            t = a[0]
            return edit_map(t.col, ottl.delete_matching_keys(F.col(t.col), _lit_str(a[1])))
        if e == "keep_matching_keys":
            t = a[0]
            return edit_map(t.col, ottl.keep_matching_keys(F.col(t.col), _lit_str(a[1])))
        if e == "keep_keys":
            t = a[0]
            keys = [x for x in a[1]] if isinstance(a[1], list) else a[1:]
            return edit_map(t.col, ottl.keep_keys(F.col(t.col), [_lit_str(k) for k in keys]))
        if e == "truncate_all":
            t = a[0]
            return edit_map(t.col, ottl.truncate_all(F.col(t.col), _lit_int(a[1])))
        if e == "limit":
            t = a[0]
            prio = [_lit_str(x) for x in a[2]] if len(a) > 2 and isinstance(a[2], list) else None
            return edit_map(t.col, ottl.limit_map(F.col(t.col), _lit_int(a[1]), prio))
        if e == "replace_pattern":
            t = a[0]
            new_val = ottl.replace_pattern(t.get(), _lit_str(a[1]), _lit_str(a[2]))
            if t.key is not None:
                return edit_map(t.col, ottl.set_key(F.col(t.col), t.key, new_val))
            final = new_val if cond is None else F.when(cond, new_val).otherwise(F.col(t.col))
            return df.withColumn(t.col, final)
        if e == "replace_match":
            t = a[0]
            new_val = ottl.replace_match(t.get(), _lit_str(a[1]), _lit_str(a[2]))
            if t.key is not None:
                return edit_map(t.col, ottl.set_key(F.col(t.col), t.key, new_val))
            final = new_val if cond is None else F.when(cond, new_val).otherwise(F.col(t.col))
            return df.withColumn(t.col, final)
        if e == "replace_all_matches":
            t = a[0]
            # reference signature: (target, mode, pattern, replacement)
            glob, repl = (_lit_str(a[2]), _lit_str(a[3])) if len(a) == 4 else (_lit_str(a[1]), _lit_str(a[2]))
            return edit_map(t.col, ottl.replace_all_matches(F.col(t.col), glob, repl))
        if e == "flatten":
            t = a[0]
            return edit_map(t.col, ottl.flatten_attrs(F.col(t.col)))
        if e == "replace_all_patterns":
            t = a[0]
            # reference signature: (target, mode, pattern, replacement)
            pattern, repl = (_lit_str(a[2]), _lit_str(a[3])) if len(a) == 4 else (_lit_str(a[1]), _lit_str(a[2]))
            return edit_map(t.col, ottl.replace_all_patterns(F.col(t.col), pattern, repl))
        if e == "merge_maps":
            t = a[0]
            return edit_map(t.col, ottl.merge_maps(F.col(t.col), _to_col(a[1]), _lit_str(a[2])))
        if e == "append":
            t = a[0]
            if t.key is not None:
                raise ValueError("append targets a top-level list column")
            new_val = ottl.append_list(F.col(t.col), _to_col(a[1]))
            final = new_val if cond is None else F.when(cond, new_val).otherwise(F.col(t.col))
            return df.withColumn(t.col, final)
        raise ValueError(f"unsupported editor {e!r}")


def parse_statement(src: str) -> Statement:
    """Parse `editor(args...) [where condition]`. The statement is
    tokenized ONCE; the `where` keyword is located as a token (never
    inside a string literal), and every token must be consumed — trailing
    garbage (e.g. a misspelled `where`) is an error, not a silent
    unconditional edit."""
    p = _Parser(src.strip())
    kind, editor = p.expect("ident")
    del kind
    args = _editor_args(p)
    cond = None
    kind2, val2 = p.peek()
    if kind2 == "ident" and val2 == "where":
        p.next()
        cond = p.boolean()
    p.expect("eof")
    return Statement(editor, args, cond, src)


def _editor_args(p: _Parser) -> list:
    return p.args()


def parse_condition(src: str) -> Column:
    """Parse a bare OTTL condition (filterprocessor / routingconnector
    route expressions) into a boolean Column."""
    p = _Parser(src.strip())
    cond = p.boolean()
    p.expect("eof")
    return cond


def apply_statements(df: DataFrame, statements: list[str]) -> DataFrame:
    """StatementSequence.Execute (parser.go:398-418): statements apply in
    order, each seeing the previous one's effects."""
    for s in statements:
        df = parse_statement(s).apply(df)
    return df
