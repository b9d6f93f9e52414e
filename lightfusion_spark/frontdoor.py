"""SQL front-door: the minimal dialect shim in front of ``spark.sql``.

PySpark cannot install parser extensions without JVM jars, so the
reference's custom DDL surface is handled by *string-level preprocessing*
before delegating to Spark (SURVEY.md §3.1, §4.2).  Exactly four constructs
are intercepted — everything else passes through verbatim:

1. ``CREATE FUNCTION name(DOUBLE[]) RETURNS DOUBLE[] LANGUAGE LIGHTGBM
   AS 'path'`` — the reference's FunctionFactory DDL (``src/lib.rs:27-79``,
   ``README.md:17-23``) with its defaulting rules: missing arg type ->
   DOUBLE (``src/lib.rs:35-42``), missing return type -> input type
   (``src/lib.rs:46-49``), missing body -> ``model/{name}.lgbm``
   (``src/lib.rs:55``).
2. ``SET lightfusion.<key> = <value>`` — validated like the reference's
   config extension: unknown key errors (``src/config.rs:37-39``),
   non-positive/unparsable batch_size errors (``src/config.rs:30-44``).
3. ``information_schema.df_settings`` -> the ``df_settings`` temp view
   (Spark has no pluggable information_schema catalog).
4. ``[a, b, c]`` array literals -> ``array(a, b, c)`` — DataFusion SQL
   accepts bracket literals (``src/lib.rs:134-136``); Spark SQL does not.
   Subscript expressions (``arr[1]``, ``map['k']``) are left untouched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from . import config as lf_config
from .errors import InvalidDdlError, UnsupportedTypeError

CREATE_FUNCTION_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"\(\s*(?P<arg>[^)]*?)\s*\)\s*"
    r"(?:RETURNS\s+(?P<ret>[A-Za-z0-9_\[\]<>\s]+?)\s+)?"
    r"LANGUAGE\s+LIGHTGBM\s*"
    r"(?:AS\s+(?P<body>'[^']*'|\S+)\s*)?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

SET_LIGHTFUSION_RE = re.compile(
    r"^\s*SET\s+(?P<key>lightfusion\.[A-Za-z0-9_.]+)\s*=\s*(?P<value>.+?)\s*;?\s*$",
    re.IGNORECASE,
)

_TYPE_ALIASES = {
    "double": "double",
    "float8": "double",
    "float64": "double",
    "float": "float",
    "real": "float",
    "float4": "float",
    "float32": "float",
}


@dataclass
class CreateFunctionStmt:
    name: str
    input_type: str  # spark element type name: "float" | "double"
    return_type: str
    model_path: str


def _normalize_array_type(type_text: str | None) -> str | None:
    """``DOUBLE[]`` / ``ARRAY<DOUBLE>`` / bare ``DOUBLE`` -> element type name.

    The reference defaults a missing arg type to Float64 and unwraps
    List fields to their element type (``src/lib.rs:35-49,81-95``).
    """
    if type_text is None or not type_text.strip():
        return None
    t = type_text.strip().lower().rstrip(";").strip()
    m = re.fullmatch(r"([a-z0-9_]+)\s*\[\s*\]", t)
    if m:
        t = m.group(1)
    m = re.fullmatch(r"array\s*<\s*([a-z0-9_]+)\s*>", t)
    if m:
        t = m.group(1)
    if t not in _TYPE_ALIASES:
        raise UnsupportedTypeError(f"unsupported type in CREATE FUNCTION: {type_text!r}")
    return _TYPE_ALIASES[t]


def parse_create_function(sql: str) -> CreateFunctionStmt | None:
    """Parse the LIGHTGBM DDL; returns None if the statement is not one."""
    m = CREATE_FUNCTION_RE.match(sql)
    if m is None:
        return None
    name = m.group("name")
    input_type = _normalize_array_type(m.group("arg")) or "double"
    return_type = _normalize_array_type(m.group("ret")) or input_type
    body = m.group("body")
    if body is None:
        # default model path (src/lib.rs:55)
        model_path = f"model/{name}.lgbm"
    elif body.startswith("'") and body.endswith("'"):
        model_path = body[1:-1]
    else:
        # non-literal function body -> error (src/lib.rs:53-54)
        raise InvalidDdlError(
            f"expected a string literal function body, got: {body!r}"
        )
    return CreateFunctionStmt(name, input_type, return_type, model_path)


_EXTERNAL_TABLE_HEAD_RE = re.compile(
    r"^\s*CREATE\s+EXTERNAL\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s+(?P<tail>.*?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_STORED_AS_RE = re.compile(r"\bSTORED\s+AS\s+(?P<fmt>[A-Za-z]+)", re.IGNORECASE)
_DELIMITER_RE = re.compile(r"\bDELIMITER\s+'(?P<delim>[^']*)'", re.IGNORECASE)
_LOCATION_RE = re.compile(r"\bLOCATION\s+'(?P<loc>[^']*)'", re.IGNORECASE)
_HEADER_RE = re.compile(r"\bWITH\s+HEADER\s+ROW\b", re.IGNORECASE)

_EXTERNAL_FORMATS = {"csv", "parquet", "json"}


@dataclass
class CreateExternalTableStmt:
    name: str
    format: str  # "csv" | "parquet" | "json"
    location: str
    delimiter: str = ","
    header: bool = False


def parse_create_external_table(sql: str) -> CreateExternalTableStmt | None:
    """Parse DataFusion's ``CREATE EXTERNAL TABLE name STORED AS CSV
    DELIMITER '\\t' LOCATION 'path'`` DDL (the reference's TSV example,
    ``examples/lightfusion_tsv.rs:20-24``).  Clause order is free; returns
    None when the statement is not an external-table DDL."""
    m = _EXTERNAL_TABLE_HEAD_RE.match(sql)
    if m is None:
        return None
    tail = m.group("tail")
    fmt_m = _STORED_AS_RE.search(tail)
    loc_m = _LOCATION_RE.search(tail)
    if fmt_m is None or loc_m is None:
        raise InvalidDdlError(
            "CREATE EXTERNAL TABLE requires STORED AS <format> and LOCATION '<path>'"
        )
    fmt = fmt_m.group("fmt").lower()
    if fmt not in _EXTERNAL_FORMATS:
        raise UnsupportedTypeError(
            f"unsupported external table format: {fmt.upper()} "
            f"(supported: {', '.join(sorted(f.upper() for f in _EXTERNAL_FORMATS))})"
        )
    delim_m = _DELIMITER_RE.search(tail)
    return CreateExternalTableStmt(
        name=m.group("name"),
        format=fmt,
        location=loc_m.group("loc"),
        delimiter=delim_m.group("delim") if delim_m else ",",
        header=_HEADER_RE.search(tail) is not None,
    )


def parse_set_lightfusion(sql: str) -> tuple[str, str] | None:
    m = SET_LIGHTFUSION_RE.match(sql)
    if m is None:
        return None
    key = m.group("key").lower()
    value = m.group("value").strip()
    if value.startswith("'") and value.endswith("'") and len(value) >= 2:
        value = value[1:-1]
    return key, lf_config.validate_set(key, value)


# A ``[`` after one of these tokens is an array *literal*; after any other
# identifier, a ``)``/``]``, or a quoted value it is a *subscript*.  Tokens
# that can legally be column names in that position (``values``, ``end``,
# ``set``, ``using``...) are deliberately absent so ``SELECT values[1]``
# stays a subscript.
_KEYWORDS_BEFORE_LITERAL = frozenset(
    """select where and or not in when then else as by having
    return union all distinct like between is join asc desc
    limit offset with cross inner
    exists any some""".split()
)
_TRAILING_WORD_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)\s*$")


def _bracket_is_subscript(prefix: str) -> bool:
    """Decide literal-vs-subscript from the already-emitted SQL prefix."""
    stripped = prefix.rstrip()
    if not stripped:
        return False
    last = stripped[-1]
    if last in ")]`'\"":
        return True
    m = _TRAILING_WORD_RE.search(stripped)
    if m:
        return m.group(1).lower() not in _KEYWORDS_BEFORE_LITERAL
    return False


def rewrite_array_literals(sql: str) -> str:
    """Rewrite ``[e1, e2, ...]`` literals to ``array(e1, e2, ...)``.

    Single-quoted strings, double-quoted/backtick identifiers, and line
    comments are skipped; ``[`` directly following an identifier/closing
    bracket is treated as a subscript and left alone.
    """
    out: list[str] = []
    # Stack entries are True where the matching ``[`` was rewritten to array(
    bracket_stack: list[bool] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if sql[j] == ch:
                    if ch == "'" and j + 1 < n and sql[j + 1] == "'":
                        j += 2  # escaped '' inside string
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        if ch == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            j = n if j == -1 else j
            out.append(sql[i:j])
            i = j
            continue
        if ch == "[":
            if _bracket_is_subscript("".join(out)):
                out.append("[")
                bracket_stack.append(False)
            else:
                out.append("array(")
                bracket_stack.append(True)
            i += 1
            continue
        if ch == "]":
            rewrote = bracket_stack.pop() if bracket_stack else False
            out.append(")" if rewrote else "]")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


INFO_SCHEMA_RE = re.compile(r"\binformation_schema\.df_settings\b", re.IGNORECASE)


def _map_unquoted(sql: str, fn) -> str:
    """Apply ``fn`` to every maximal run of SQL text that is outside
    single/double/backtick quotes and ``--`` comments."""
    out: list[str] = []
    plain: list[str] = []
    i, n = 0, len(sql)

    def flush_plain() -> None:
        if plain:
            out.append(fn("".join(plain)))
            plain.clear()

    while i < n:
        ch = sql[i]
        if ch in ("'", '"', "`"):
            flush_plain()
            j = i + 1
            while j < n:
                if sql[j] == ch:
                    if ch == "'" and j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        if ch == "-" and i + 1 < n and sql[i + 1] == "-":
            flush_plain()
            j = sql.find("\n", i)
            j = n if j == -1 else j
            out.append(sql[i:j])
            i = j
            continue
        plain.append(ch)
        i += 1
    flush_plain()
    return "".join(out)


def preprocess(sql: str) -> str:
    """Pure-string rewrites applied to pass-through SQL.

    Both rewrites are quote-aware: string literals, quoted identifiers and
    ``--`` comments are never touched, so e.g. the *data value*
    ``'information_schema.df_settings'`` survives intact.
    """
    if INFO_SCHEMA_RE.search(sql):
        sql = _map_unquoted(sql, lambda s: INFO_SCHEMA_RE.sub("df_settings", s))
    if "[" in sql:
        sql = rewrite_array_literals(sql)
    return sql
