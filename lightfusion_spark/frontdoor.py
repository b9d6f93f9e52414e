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
    r"^\s*CREATE\s+FUNCTION\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*"
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
# identifier, a ``)``/``]``, or a quoted value it is a *subscript*.
_KEYWORDS_BEFORE_LITERAL = frozenset(
    """select from where and or not in on when then else end as by having
    return values union all distinct like between is join case asc desc
    limit offset group order set using with cross inner left right full
    semi anti exists any some array_contains if coalesce""".split()
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


def preprocess(sql: str) -> str:
    """Pure-string rewrites applied to pass-through SQL."""
    sql = INFO_SCHEMA_RE.sub("df_settings", sql)
    if "[" in sql:
        sql = rewrite_array_literals(sql)
    return sql
