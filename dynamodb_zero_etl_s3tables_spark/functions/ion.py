"""Amazon Ion text codec for the DynamoDB PITR-export subset
(SURVEY.md §2 B1; VERDICT r6 #2).

``dynamodb:ExportTableToPointInTime`` (the action the reference
grants at src/dynamodb-zero-etl-s3tables.ts:135) emits DYNAMODB_JSON
*or* ION. The ION form is newline-delimited text-Ion documents::

    $ion_1_0 {Item:{pk:"ORDER#1",custkey:370,flag:true,tags:$dynamodb_SS::["a","b"]}}

with the published type mapping (Amazon Ion spec,
https://amzn.github.io/ion-docs/ + the DynamoDB export docs):

=============  ==================================================
DynamoDB type  Ion text form
=============  ==================================================
S              string ``"..."``
N              int ``123`` / decimal ``1.5`` / ``1.5d-3``
B              blob ``{{base64}}``
BOOL           ``true`` / ``false``
NULL           ``null`` (or typed ``null.<type>``)
M              struct ``{name:value, 'quoted name':value}``
L              list ``[v, v]``
SS / NS / BS   annotated list ``$dynamodb_SS::[...]`` etc.
=============  ==================================================

This module converts each ION line to the DYNAMODB_JSON item map so
the export reader feeds **the same B3 codec**
(:func:`..functions.decode.decode_item_column`) for both formats —
one decode surface, two wire forms. The parser is a dependency-free
recursive-descent over exactly this subset; anything outside it
(timestamps, sexps, clobs, symbol values) raises :class:`IonParseError`
naming the construct — loud, never a silent partial decode.

Scale: the conversion is a string->string Arrow-batched pandas UDF
(:func:`ion_lines_to_item_json`) running partition-parallel over the
text scan; the JVM-side from_json decode and everything downstream is
byte-identical to the JSON path. Python is unavoidable here (no
JVM-side Ion parser in a stock Spark), and it touches each line once.
"""

from __future__ import annotations

import json
import re
from decimal import Decimal

#: annotations the export uses to mark DynamoDB set types
_SET_ANNOTATIONS = {
    "$dynamodb_SS": "SS",
    "$dynamodb_NS": "NS",
    "$dynamodb_BS": "BS",
}

_SYMBOL_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_WS_RE = re.compile(r"[ \t\r\n]*")
_TS_RE = re.compile(r"\d{4}-\d{2}")
_NUMBER_RE = re.compile(r"[+-]?\d+(?:\.\d*)?(?:[dDeE][+-]?\d+)?")

_STR_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "0": "\0", "a": "\a", "b": "\b",
    "f": "\f", "v": "\v", '"': '"', "'": "'", "\\": "\\", "/": "/",
}


class IonParseError(ValueError):
    """The line is not in the Ion subset a DynamoDB export emits."""


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    # -- lexing helpers ------------------------------------------------------

    def error(self, msg: str) -> IonParseError:
        ctx = self.s[max(0, self.i - 10): self.i + 10]
        return IonParseError(f"{msg} at offset {self.i} (near {ctx!r})")

    def skip_ws(self) -> None:
        # hot path: machine-generated export lines have 0-1 spaces and
        # no comments — a tiny char loop beats a regex call here
        # (profiled: skip_ws is ~37% of parse time at ~59 calls/line)
        s, i, n = self.s, self.i, self.n
        while i < n:
            c = s[i]
            if c in " \t\r\n":
                i += 1
            elif c == "/":  # rare: comments
                if s.startswith("//", i):
                    j = s.find("\n", i)
                    i = n if j < 0 else j + 1
                elif s.startswith("/*", i):
                    j = s.find("*/", i + 2)
                    if j < 0:
                        self.i = i
                        raise self.error("unterminated block comment")
                    i = j + 2
                else:
                    break
            else:
                break
        self.i = i

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def expect(self, ch: str) -> None:
        if not self.s.startswith(ch, self.i):
            raise self.error(f"expected {ch!r}")
        self.i += len(ch)

    # -- documents -----------------------------------------------------------

    def parse_document(self) -> dict:
        """One top-level value, after an optional ``$ion_1_0`` marker."""
        self.skip_ws()
        m = _SYMBOL_RE.match(self.s, self.i)
        if m and m.group(0) == "$ion_1_0":
            self.i = m.end()
            self.skip_ws()
        v = self.parse_value()
        self.skip_ws()
        if self.i != self.n:
            raise self.error("trailing content after the Ion document")
        return v

    # -- values --------------------------------------------------------------

    def parse_value(self) -> dict:
        """One Ion value as a DynamoDB AttributeValue dict."""
        self.skip_ws()
        annotations: list[str] = []
        # annotations start with a symbol — skip the probe entirely for
        # the common literals ({, [, ", digits, ...)
        while self.i < self.n and (self.s[self.i].isalpha() or self.s[self.i] in "_$"):
            m = _SYMBOL_RE.match(self.s, self.i)
            if not m:
                break
            save = self.i
            self.i = m.end()
            self.skip_ws()
            if self.s.startswith("::", self.i):
                annotations.append(m.group(0))
                self.i += 2
                self.skip_ws()
            else:
                self.i = save
                break
        core = self._parse_core()
        return self._apply_annotations(annotations, core)

    def _apply_annotations(self, annotations: list[str], core: dict) -> dict:
        sets = [a for a in annotations if a in _SET_ANNOTATIONS]
        if not sets:
            return core  # unknown annotations: metadata, value unchanged
        tag = _SET_ANNOTATIONS[sets[0]]
        if "L" not in core:
            raise IonParseError(f"{sets[0]} annotates a non-list value")
        want = {"SS": "S", "NS": "N", "BS": "B"}[tag]
        out = []
        for el in core["L"]:
            if want not in el:
                raise IonParseError(
                    f"{sets[0]} element is not of type {want}: {el!r}"
                )
            out.append(el[want])
        return {tag: out}

    def _parse_core(self) -> dict:
        c = self.peek()
        if c == "{":
            if self.s.startswith("{{", self.i):
                return {"B": self._parse_blob()}
            return {"M": self._parse_struct()}
        if c == "[":
            return {"L": self._parse_list()}
        if c == '"':
            return {"S": self._parse_string('"')}
        if c == "(":
            raise self.error("Ion s-expressions are outside the export subset")
        if c and (c.isdigit() or c in "+-"):
            # a timestamp also starts with a digit: detect yyyy-mm-dd
            # (positional match — slicing the tail here is O(n) per
            # number and turned number-heavy lines quadratic)
            if _TS_RE.match(self.s, self.i):
                raise self.error(
                    "Ion timestamps are outside the export subset "
                    "(DynamoDB has no native timestamp type)"
                )
            return {"N": self._parse_number()}
        m = _SYMBOL_RE.match(self.s, self.i)
        if m:
            word = m.group(0)
            if word == "true":
                self.i = m.end()
                return {"BOOL": True}
            if word == "false":
                self.i = m.end()
                return {"BOOL": False}
            if word == "null":
                self.i = m.end()
                # typed nulls: null.string, null.int, ...
                if self.peek() == ".":
                    self.i += 1
                    t = _SYMBOL_RE.match(self.s, self.i)
                    if not t:
                        raise self.error("malformed typed null")
                    self.i = t.end()
                return {"NULL": True}
            if word in ("nan", "inf"):
                raise self.error(f"Ion {word} is outside the export subset")
            raise self.error(
                f"bare symbol {word!r} is not a value in the export subset"
            )
        raise self.error("unrecognized Ion value")

    def _parse_struct(self) -> dict:
        self.expect("{")
        out: dict[str, dict] = {}
        self.skip_ws()
        if self.peek() == "}":
            self.i += 1
            return out
        while True:
            self.skip_ws()
            name = self._parse_field_name()
            self.skip_ws()
            self.expect(":")
            out[name] = self.parse_value()
            self.skip_ws()
            if self.peek() == ",":
                self.i += 1
                self.skip_ws()
                if self.peek() == "}":  # trailing comma
                    self.i += 1
                    return out
                continue
            self.expect("}")
            return out

    def _parse_field_name(self) -> str:
        c = self.peek()
        if c == '"':
            return self._parse_string('"')
        if c == "'":
            return self._parse_string("'")
        m = _SYMBOL_RE.match(self.s, self.i)
        if not m:
            raise self.error("expected a struct field name")
        self.i = m.end()
        return m.group(0)

    def _parse_list(self) -> list[dict]:
        self.expect("[")
        out: list[dict] = []
        self.skip_ws()
        if self.peek() == "]":
            self.i += 1
            return out
        while True:
            out.append(self.parse_value())
            self.skip_ws()
            if self.peek() == ",":
                self.i += 1
                self.skip_ws()
                if self.peek() == "]":  # trailing comma
                    self.i += 1
                    return out
                continue
            self.expect("]")
            return out

    def _parse_string(self, quote: str) -> str:
        self.expect(quote)
        parts: list[str] = []
        while True:
            # bulk-copy up to the next quote or escape (one find per
            # segment instead of one loop step per character)
            q = self.s.find(quote, self.i)
            if q < 0:
                raise self.error("unterminated string")
            b = self.s.find("\\", self.i, q)
            if b < 0:
                parts.append(self.s[self.i:q])
                self.i = q + 1
                return "".join(parts)
            parts.append(self.s[self.i:b])
            self.i = b
            c = self.s[self.i]
            if c == "\\":
                self.i += 1
                e = self.s[self.i: self.i + 1]
                if e in _STR_ESCAPES:
                    parts.append(_STR_ESCAPES[e])
                    self.i += 1
                elif e == "x":
                    parts.append(self._hex_escape("x", 2))
                elif e == "u":
                    parts.append(self._hex_escape("u", 4))
                elif e == "U":
                    parts.append(self._hex_escape("U", 8))
                elif e == "\n":
                    self.i += 1  # escaped newline: continuation
                else:
                    raise self.error(f"unsupported string escape \\{e}")

    def _hex_escape(self, kind: str, width: int) -> str:
        """Decode ``\\x??`` / ``\\u????`` / ``\\U????????`` at the
        current escape position, VALIDATING digit count and hex-ness
        first — a truncated or malformed escape must raise
        :class:`IonParseError` with offset context (the module's
        loud-error contract), never a bare ValueError from ``int()``
        or a silent short-slice parse."""
        digits = self.s[self.i + 1: self.i + 1 + width]
        if len(digits) != width or any(
            c not in "0123456789abcdefABCDEF" for c in digits
        ):
            raise self.error(
                f"malformed \\{kind} escape (need {width} hex digits, "
                f"got {digits!r})"
            )
        self.i += 1 + width
        try:
            return chr(int(digits, 16))
        except (ValueError, OverflowError):  # \U beyond U+10FFFF
            raise self.error(
                f"\\{kind} escape {digits!r} is not a valid codepoint"
            ) from None

    def _parse_blob(self) -> str:
        self.expect("{{")
        j = self.s.find("}}", self.i)
        if j < 0:
            raise self.error("unterminated blob")
        body = "".join(self.s[self.i: j].split())
        self.i = j + 2
        if body.startswith('"') or body.startswith("'''"):
            # both clob forms ({{"..."}} and {{'''...'''}}) refuse —
            # silently treating the quoted text as base64 would be
            # the exact partial decode the loud-error contract
            # forbids (r8 review caught the triple-quoted form)
            raise self.error("Ion clobs are outside the export subset")
        return body  # base64 text, same as the JSON wire form's B

    def _parse_number(self) -> str:
        m = _NUMBER_RE.match(self.s, self.i)
        if not m:
            raise self.error("malformed number")
        self.i = m.end()
        text = m.group(0)
        # canonical N text: exact decimal, no exponent ('d' is Ion's
        # decimal exponent marker; Decimal accepts 'e')
        try:
            d = Decimal(text.replace("d", "e").replace("D", "e"))
        except ArithmeticError as exc:  # pragma: no cover - regex-gated
            raise self.error(f"bad number {text!r}: {exc}") from None
        return format(d, "f")


# ---------------------------------------------------------------------------
# public conversion surface
# ---------------------------------------------------------------------------

def ion_to_item_json(line: str) -> str | None:
    """One export line -> the DYNAMODB_JSON item map (the string
    ``decode_item_column`` consumes), or None for a blank line.
    The document must be ``{Item: {...}}`` — same envelope as the
    JSON wire form."""
    if not line.strip():
        return None
    doc = _Parser(line).parse_document()
    if "M" not in doc or "Item" not in doc["M"]:
        raise IonParseError("export line is not an {Item: {...}} struct")
    item = doc["M"]["Item"]
    if "M" not in item:
        raise IonParseError("Item is not a struct")
    return json.dumps(item["M"])


def _ion_escape(s: str, quote: str = '"') -> str:
    """Escape a string body for the given quote character: the quote,
    backslash, and EVERY control char (so an embedded newline can
    never break the one-document-per-line NDJSON framing — pinned by
    the hypothesis roundtrip law)."""
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == quote:
            out.append("\\" + quote)
        elif ord(ch) < 0x20:
            out.append(f"\\x{ord(ch):02x}")
        else:
            out.append(ch)
    return "".join(out)


def _num_ion(text) -> str:
    """Canonical Ion decimal text for an N value — the SAME plain
    no-exponent form :meth:`_Parser._parse_number` emits, so the
    roundtrip is byte-stable for ANY valid N input (e.g. ``0E-8``
    normalizes to ``0.00000000`` on both sides; pinned by the
    hypothesis roundtrip law). Also keeps the wire in Ion's DECIMAL
    space: passing raw ``...E...`` text through would mint an Ion
    FLOAT, a different type."""
    try:
        return format(Decimal(str(text)), "f")
    except ArithmeticError as exc:
        raise ValueError(f"invalid N value {text!r}: {exc}") from None


def _encode_av(av: dict) -> str:
    """AttributeValue dict -> Ion text (the fixture-writer inverse of
    the parser; round-trip law pinned in tests)."""
    if "S" in av:
        return f'"{_ion_escape(av["S"])}"'
    if "N" in av:
        return _num_ion(av["N"])
    if "BOOL" in av:
        return "true" if av["BOOL"] else "false"
    if "NULL" in av:
        return "null"
    if "B" in av:
        return "{{" + av["B"] + "}}"
    if "SS" in av:
        return "$dynamodb_SS::[" + ",".join(
            f'"{_ion_escape(s)}"' for s in av["SS"]) + "]"
    if "NS" in av:
        return "$dynamodb_NS::[" + ",".join(_num_ion(x) for x in av["NS"]) + "]"
    if "BS" in av:
        return "$dynamodb_BS::[" + ",".join(
            "{{" + b + "}}" for b in av["BS"]) + "]"
    if "M" in av:
        return _encode_struct(av["M"])
    if "L" in av:
        return "[" + ",".join(_encode_av(x) for x in av["L"]) + "]"
    raise ValueError(f"unknown AttributeValue {av!r}")


def _encode_field_name(name: str) -> str:
    if _SYMBOL_RE.fullmatch(name):
        return name
    return "'" + _ion_escape(name, quote="'") + "'"


def _encode_struct(m: dict) -> str:
    return "{" + ",".join(
        f"{_encode_field_name(k)}:{_encode_av(v)}" for k, v in m.items()
    ) + "}"


def item_json_to_ion(wire_line: str) -> str:
    """One DYNAMODB_JSON export line ``{"Item": {...}}`` -> the
    equivalent Ion text line (fixture writer)."""
    doc = json.loads(wire_line)
    return "$ion_1_0 " + _encode_struct({"Item": {"M": doc["Item"]}})


# -- Arrow-batched Spark surface --------------------------------------------

def ion_lines_to_item_json_udf():
    """pandas UDF: Ion export line -> DYNAMODB_JSON item-map string.
    Built lazily so importing this module never needs an active
    Spark session."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    return F.pandas_udf(
        lambda lines: lines.map(lambda s: ion_to_item_json(s) if s else None),
        T.StringType(),
    )


def item_json_to_ion_udf():
    """pandas UDF: DYNAMODB_JSON wire line -> Ion text line."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # na_action='ignore': a NULL wire line maps to a NULL Ion line
    # (mirrors the ion->json direction's `if s else None` guard)
    # instead of crashing the Arrow task inside json.loads(None)
    return F.pandas_udf(
        lambda lines: lines.map(item_json_to_ion, na_action="ignore"),
        T.StringType(),
    )
