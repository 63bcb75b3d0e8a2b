"""Line-based parser for the Medea schema-graph language.

Grammar per /root/reference/SPEC.md and the actual reference parser
(/root/reference/src/Data/Medea/Parser/Spec/*.purs, Primitive.purs):

  file      := schema (BLANK schema)*                [Schemata.purs:16-20]
  schema    := "$schema" SP ident NL block*          [Schema.purs:43-50]
  block     := type | stringvals | arrayrun | object  (each ≤ once, any
               order — applicative permutation, Permutation.purs:6-30)
  type      := 4SP "$type" NL (8SP ident NL)+        [Type.purs:24-28]
  stringvals:= 4SP "$string-values" NL (8SP string NL)+  [String.purs:34-41]
  arrayrun  := contiguous run of min/max/element/tuple, each ≤ once
               [Array.purs:46-78]
  min       := 4SP "$min-length" SP natural NL
  max       := 4SP "$max-length" SP natural NL
  element   := 4SP "$element-type" NL 8SP ident NL   (exactly one item)
  tuple     := 4SP "$tuple" NL (8SP ident NL)*
  object    := 4SP "$properties" NL propsec* addl?   [Object.purs:39-53]
  propsec   := 8SP "$property-name" SP string NL
               (8SP "$property-schema" SP ident NL)?
               (8SP "$optional-property" NL)?        [Property.purs:35-51]
  addl      := 8SP "$additional-properties-allowed" NL
               (8SP "$additional-property-schema" SP ident NL)?

Indentation is strict (exactly 0/4/8 spaces); identifiers are ≤32
symbols with no separator/control characters (Primitive.purs:64-67,
290-295); naturals reject leading zeros (Primitive.purs:252-266);
strings are double-quoted (Primitive.purs:284-287).

Post-parse array constraints (Array.purs:50-55): element+tuple or
min+tuple ⇒ ConflictingSpecRequirements; max+tuple ⇒ EmptyLengthSpec
(the reference's exact — if quirky — behavior).
"""

from __future__ import annotations

import re
import unicodedata
from typing import List, Optional, Tuple

from ... import errors as E
from .ast import ArraySpec, ObjectSpec, PropSpec, SchemaSpec

_NAT_RE = re.compile(r"^[0-9]+$")


def _is_sep_or_control(ch: str) -> bool:
    return unicodedata.category(ch) in ("Zs", "Zl", "Zp", "Cc")


def _check_identifier(tok: str, line_no: int) -> str:
    if not tok:
        raise E.ParserError("expected identifier", line_no)
    if any(_is_sep_or_control(c) for c in tok):
        raise E.ParserError(f"identifier contains separator/control: {tok!r}", line_no)
    if len(tok.encode("utf-8")) > 32:
        raise E.IdentifierTooLong(tok, line_no)
    return tok


def _parse_natural(tok: str, line_no: int) -> int:
    if not _NAT_RE.match(tok):
        raise E.ParserError(f"expected natural number, got {tok!r}", line_no)
    if tok.startswith("0"):
        raise E.LeadingZero(tok, line_no)
    return int(tok)


def _parse_medea_string(tok: str, line_no: int) -> str:
    if len(tok) < 2 or not tok.startswith('"'):
        raise E.ParserError(f"expected quoted string, got {tok!r}", line_no)
    end = tok.find('"', 1)
    if end == -1:
        raise E.ParserError(f"unterminated string: {tok!r}", line_no)
    if end != len(tok) - 1:
        raise E.ParserError(f"trailing junk after string: {tok!r}", line_no)
    return tok[1:end]


class _Line:
    __slots__ = ("no", "indent", "body")

    def __init__(self, no: int, indent: int, body: str):
        self.no, self.indent, self.body = no, indent, body


def _split_lines(text: str) -> List[_Line]:
    raw = text.split("\n")
    # a single trailing newline belongs to the last line (eol = \n | eof)
    if raw and raw[-1] == "":
        raw.pop()
    out = []
    for i, ln in enumerate(raw, start=1):
        if ln.endswith("\r"):
            ln = ln[:-1]
        body = ln.lstrip(" ")
        indent = len(ln) - len(body)
        out.append(_Line(i, indent, body))
    return out


def parse_specification(data) -> List[SchemaSpec]:
    """bytes|str → list of SchemaSpec. ≙ Schemata.parseSpecification."""
    if isinstance(data, (bytes, bytearray)):
        try:
            text = bytes(data).decode("utf-8", errors="strict")
        except UnicodeDecodeError as exc:
            raise E.NotUtf8(str(exc)) from exc
    else:
        text = data
    lines = _split_lines(text)
    # split into schema chunks on blank lines (sepBy1 eol)
    chunks: List[List[_Line]] = []
    cur: List[_Line] = []
    for ln in lines:
        if ln.indent == 0 and ln.body == "":
            chunks.append(cur)
            cur = []
        else:
            cur.append(ln)
    chunks.append(cur)
    specs = []
    for chunk in chunks:
        if not chunk:
            raise E.ParserError("expected schema, found blank", lines[-1].no if lines else 1)
        specs.append(_parse_schema(chunk))
    return specs


def _split2(body: str, line_no: int) -> Tuple[str, str]:
    """Split 'keyword rest' on a single space."""
    if " " in body:
        k, rest = body.split(" ", 1)
        return k, rest
    return body, ""


def _parse_schema(chunk: List[_Line]) -> SchemaSpec:
    head = chunk[0]
    if head.indent != 0:
        raise E.ParserError("schema header must not be indented", head.no)
    kw, rest = _split2(head.body, head.no)
    if kw != "$schema":
        raise E.ParserError(f"expected $schema, got {kw!r}", head.no)
    if not rest or " " in rest:
        raise E.ParserError("expected exactly one schema name", head.no)
    name = _check_identifier(rest, head.no)
    spec = SchemaSpec(name=name)
    saw = {"type": False, "string": False, "array": False, "object": False}

    i = 1
    n = len(chunk)

    def items_at_8(start: int, what: str, at_least_one: bool) -> Tuple[List[str], int]:
        vals: List[str] = []
        j = start
        while j < n and chunk[j].indent == 8:
            ln = chunk[j]
            if " " in ln.body:
                raise E.ParserError(f"unexpected space in {what} item", ln.no)
            vals.append(_check_identifier(ln.body, ln.no))
            j += 1
        if at_least_one and not vals:
            nxt = chunk[start].no if start < n else head.no
            raise E.ParserError(f"expected at least one {what} item", nxt)
        return vals, j

    array_acc: Optional[ArraySpec] = None

    while i < n:
        ln = chunk[i]
        if ln.indent != 4:
            raise E.ParserError(
                f"expected 4-space-indented specification header, got "
                f"indent {ln.indent}: {ln.body!r}",
                ln.no,
            )
        kw, rest = _split2(ln.body, ln.no)
        in_array_run = kw in ("$min-length", "$max-length", "$element-type", "$tuple")
        if in_array_run:
            if saw["array"]:
                raise E.ParserError("array specification given twice", ln.no)
            array_acc = ArraySpec()
            # consume a maximal contiguous run of array sub-blocks
            while i < n and chunk[i].indent == 4:
                ln = chunk[i]
                kw, rest = _split2(ln.body, ln.no)
                if kw == "$min-length":
                    if array_acc.min_length is not None:
                        raise E.ParserError("$min-length given twice", ln.no)
                    array_acc.min_length = _parse_natural(rest, ln.no)
                    i += 1
                elif kw == "$max-length":
                    if array_acc.max_length is not None:
                        raise E.ParserError("$max-length given twice", ln.no)
                    array_acc.max_length = _parse_natural(rest, ln.no)
                    i += 1
                elif kw == "$element-type":
                    if rest:
                        raise E.ParserError("$element-type takes no inline arg", ln.no)
                    if array_acc.element_type is not None:
                        raise E.ParserError("$element-type given twice", ln.no)
                    vals, i = items_at_8(i + 1, "$element-type", at_least_one=True)
                    if len(vals) != 1:
                        # reference parses exactly one (Array.purs:70-74);
                        # a second 8-indent line would fail the permutation
                        raise E.ParserError(
                            "$element-type takes exactly one schema", ln.no
                        )
                    array_acc.element_type = vals[0]
                elif kw == "$tuple":
                    if rest:
                        raise E.ParserError("$tuple takes no inline arg", ln.no)
                    if array_acc.tuple_spec is not None:
                        raise E.ParserError("$tuple given twice", ln.no)
                    vals, i = items_at_8(i + 1, "$tuple", at_least_one=False)
                    array_acc.tuple_spec = vals
                else:
                    break
            # post-conditions (Array.purs:50-55, order preserved)
            a = array_acc
            if a.element_type is not None and a.tuple_spec is not None:
                raise E.ConflictingSpecRequirements("element-type with tuple", ln.no)
            if a.min_length is not None and a.tuple_spec is not None:
                raise E.ConflictingSpecRequirements("min-length with tuple", ln.no)
            if a.max_length is not None and a.tuple_spec is not None:
                raise E.EmptyLengthSpec("max-length with tuple", ln.no)
            saw["array"] = True
            spec.array = array_acc
        elif kw == "$type":
            if rest:
                raise E.ParserError("$type takes no inline arg", ln.no)
            if saw["type"]:
                raise E.ParserError("$type given twice", ln.no)
            vals, i = items_at_8(i + 1, "$type", at_least_one=True)
            saw["type"] = True
            spec.types = vals
        elif kw == "$string-values":
            if rest:
                raise E.ParserError("$string-values takes no inline arg", ln.no)
            if saw["string"]:
                raise E.ParserError("$string-values given twice", ln.no)
            vals = []
            j = i + 1
            while j < n and chunk[j].indent == 8:
                vals.append(_parse_medea_string(chunk[j].body, chunk[j].no))
                j += 1
            if not vals:
                raise E.EmptyStringValueSpec("no string value lines", ln.no)
            saw["string"] = True
            spec.string_vals = vals
            i = j
        elif kw == "$properties":
            if rest:
                raise E.ParserError("$properties takes no inline arg", ln.no)
            if saw["object"]:
                raise E.ParserError("$properties given twice", ln.no)
            obj, i = _parse_object(chunk, i + 1, n)
            saw["object"] = True
            spec.obj = obj
        else:
            raise E.ParserError(f"unknown specification header {kw!r}", ln.no)
    return spec


def _parse_object(chunk: List[_Line], i: int, n: int) -> Tuple[ObjectSpec, int]:
    obj = ObjectSpec()
    # property sections (many, in declaration order)
    while i < n and chunk[i].indent == 8:
        ln = chunk[i]
        kw, rest = _split2(ln.body, ln.no)
        if kw != "$property-name":
            break
        pname = _parse_medea_string(rest, ln.no)
        prop = PropSpec(name=pname)
        i += 1
        if i < n and chunk[i].indent == 8:
            kw2, rest2 = _split2(chunk[i].body, chunk[i].no)
            if kw2 == "$property-schema":
                prop.schema = _check_identifier(rest2, chunk[i].no)
                i += 1
        if i < n and chunk[i].indent == 8:
            kw3, _ = _split2(chunk[i].body, chunk[i].no)
            if kw3 == "$optional-property":
                if _split2(chunk[i].body, chunk[i].no)[1]:
                    raise E.ParserError("$optional-property takes no arg", chunk[i].no)
                prop.optional = True
                i += 1
        obj.properties.append(prop)
    # optional additional-properties block
    if i < n and chunk[i].indent == 8:
        kw, rest = _split2(chunk[i].body, chunk[i].no)
        if kw == "$additional-properties-allowed":
            if rest:
                raise E.ParserError(
                    "$additional-properties-allowed takes no arg", chunk[i].no
                )
            obj.additional_allowed = True
            i += 1
            if i < n and chunk[i].indent == 8:
                kw2, rest2 = _split2(chunk[i].body, chunk[i].no)
                if kw2 == "$additional-property-schema":
                    obj.additional_schema = _check_identifier(rest2, chunk[i].no)
                    i += 1
    # any remaining 8-indent line here is an error (incl. the
    # additional-property-schema-without-allowed fixture)
    if i < n and chunk[i].indent == 8:
        bad = chunk[i]
        kw = _split2(bad.body, bad.no)[0]
        if kw == "$additional-property-schema":
            raise E.ConflictingSpecRequirements(
                "$additional-property-schema without "
                "$additional-properties-allowed",
                bad.no,
            )
        raise E.ParserError(f"unexpected line in $properties: {bad.body!r}", bad.no)
    return obj, i


def parse_file(path: str) -> List[SchemaSpec]:
    with open(path, "rb") as fh:
        return parse_specification(fh.read())
