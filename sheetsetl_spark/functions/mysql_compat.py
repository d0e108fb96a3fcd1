"""MySQL dialect compatibility layer (SURVEY §2-B B43-B49, §7 hard parts).

The reference's users write MySQL SELECTs (shipped verbatim to the server
at /root/reference/src/loader.py:231). Spark SQL covers almost all of that
dialect natively — including backtick identifiers, `<=>`, DIV, IFNULL,
SUBSTRING_INDEX. This module fills the actual gaps:

- expression helpers for MySQL idioms with no 1:1 Spark function
  (GROUP_CONCAT, IF, numeric TRUNCATE, %-style DATE_FORMAT);
- ``mysql_to_spark_sql``: a conservative text-level translator for the
  few syntax deltas that appear in real analyst SQL (LIMIT offset,count;
  DATE_FORMAT/STR_TO_DATE %-patterns; GROUP_CONCAT). It rewrites only
  what it positively recognizes and leaves everything else untouched, so
  valid Spark SQL passes through unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def group_concat(col: Column | str, sep: str = ",", distinct: bool = False) -> Column:
    """MySQL GROUP_CONCAT(x [SEPARATOR sep]) — determinized: values are
    sorted before concatenation (MySQL's unordered default is
    nondeterministic; SURVEY §7 risk #2)."""
    c = F.col(col) if isinstance(col, str) else col
    collected = F.collect_set(c) if distinct else F.collect_list(c)
    return F.concat_ws(sep, F.sort_array(collected))


def if_(cond: Column, true_val, false_val) -> Column:
    """MySQL IF(cond, a, b)."""
    return F.when(cond, true_val).otherwise(false_val)


def ifnull(col: Column | str, default) -> Column:
    """MySQL IFNULL(x, d)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def truncate_number(col: Column | str, d: int = 0) -> Column:
    """MySQL TRUNCATE(x, d): truncate toward zero (Spark's round() rounds;
    floor() truncates toward -inf — both wrong for negatives)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = 10**d
    return (c * scale).cast("bigint") / scale


#: MySQL DATE_FORMAT specifier -> Java SimpleDateFormat pattern.
_MYSQL_TO_JAVA_PATTERNS = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%c": "M",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%k": "H",
    "%h": "hh",
    "%i": "mm",
    "%s": "ss",
    "%S": "ss",
    "%f": "SSSSSS",
    "%M": "MMMM",
    "%b": "MMM",
    "%W": "EEEE",
    "%a": "EEE",
    "%j": "DDD",
    "%p": "a",
    "%T": "HH:mm:ss",
    "%%": "%",
}


def _translate_pattern(mysql_pattern: str) -> str:
    out = []
    i = 0
    while i < len(mysql_pattern):
        ch = mysql_pattern[i]
        if ch == "%" and i + 1 < len(mysql_pattern):
            spec = mysql_pattern[i : i + 2]
            out.append(_MYSQL_TO_JAVA_PATTERNS.get(spec, spec))
            i += 2
        elif ch.isalpha():
            # literal letters must be quoted in Java patterns
            out.append(f"'{ch}'")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def date_format_mysql(col: Column | str, mysql_pattern: str) -> Column:
    """MySQL DATE_FORMAT(ts, '%Y-%m-%d ...') with %-specifier translation
    (SURVEY §7 hard part #1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, _translate_pattern(mysql_pattern))


_LIMIT_OFFSET_RE = re.compile(r"\bLIMIT\s+(\d+)\s*,\s*(\d+)", re.IGNORECASE)
# First-argument pattern shared by the function rewrites: comma-free text,
# optionally containing ONE level of balanced parens (covers CAST(x AS
# DATE), TRIM(x) — conservative by design; deeper nesting passes through).
_ARG = r"((?:[^,()\x00]|\x00\d+\x00|\([^()]*\))+?)"
# String literals appear as \x00<slot>\x00 masks by the time these run.
_DATE_FORMAT_RE = re.compile(
    r"\b(DATE_FORMAT|STR_TO_DATE)\s*\(" + _ARG + r",\s*\x00(\d+)\x00\s*\)",
    re.IGNORECASE,
)
# DATE_ADD(x, INTERVAL n unit) and friends -> Spark datetime +/- interval
# arithmetic. MySQL interval units Spark's literal syntax also accepts.
_INTERVAL_FN_RE = re.compile(
    r"\b(DATE_ADD|ADDDATE|DATE_SUB|SUBDATE)\s*\(" + _ARG + r",\s*"
    r"INTERVAL\s+(-?\d+)\s+(YEAR|QUARTER|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND)\s*\)",
    re.IGNORECASE,
)
# MySQL RAND(seed) seeds a per-ROW generator whose sequence depends on
# server-side evaluation order — no Spark rewrite can reproduce it.
_SEEDED_RAND_RE = re.compile(r"\bRAND\s*\(\s*[^)\s]", re.IGNORECASE)
# @user_vars / @@system_vars hold server session state; Spark has none.
_USER_VAR_RE = re.compile(r"@{1,2}\w+")
_GROUP_CONCAT_RE = re.compile(
    r"\bGROUP_CONCAT\s*\(\s*(DISTINCT\s+)?([^()]+?)(?:\s+SEPARATOR\s+\x00(\d+)\x00)?\s*\)",
    re.IGNORECASE,
)
# Longest-match-at-position alternation: a string consumes any '--' inside
# it, a comment consumes any quote inside it — whichever starts first wins.
_STRING_OR_COMMENT_RE = re.compile(
    r"'(?:[^']|'')*'|--[^\n]*|#[^\n]*|/\*.*?\*/", re.DOTALL
)


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    """Replace string literals and comments with \\x00<slot>\\x00 tokens so
    keyword rewrites can never fire inside e.g. ``'see LIMIT 1, 2'``."""
    slots: list[str] = []

    def repl(m: re.Match) -> str:
        slots.append(m.group(0))
        return f"\x00{len(slots) - 1}\x00"

    return _STRING_OR_COMMENT_RE.sub(repl, sql), slots


def _unmask(sql: str, slots: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: slots[int(m.group(1))], sql)


class UnsupportedMySQLConstruct(ValueError):
    """A MySQL construct whose semantics cannot be reproduced on Spark.

    Raised (instead of silently passing broken syntax through to the
    Spark parser) so the pipeline's per-file error isolation records a
    CLEAR reason; the file is skipped, the run continues — exactly the
    reference's per-file SQL-error contract (loader.py:232-234)."""


def mysql_to_spark_sql(sql: str) -> str:
    """Best-effort MySQL -> Spark SQL text translation for the syntax
    deltas Spark doesn't accept natively. Conservative: rewrites only
    recognized constructs, and only OUTSIDE string literals / comments
    (literals and -- # /* */ comments are masked before any rewrite, so
    a query like ``WHERE note = 'see LIMIT 1, 2'`` is untouched).

    - ``LIMIT off, cnt``          -> ``LIMIT cnt OFFSET off``
    - ``DATE_FORMAT(x, '%Y..')``  -> Java pattern equivalent
    - ``STR_TO_DATE(x, '%Y..')``  -> ``TO_TIMESTAMP(x, 'yyyy..')``
    - ``GROUP_CONCAT(x [SEPARATOR s])`` -> sorted concat_ws/collect_list
    - ``DATE_ADD/ADDDATE/DATE_SUB/SUBDATE(x, INTERVAL n unit)``
                                  -> ``(x + INTERVAL n unit)`` / ``-``

    Rejected with :class:`UnsupportedMySQLConstruct` (no faithful Spark
    semantics exist; a clear error beats a silently-different answer):

    - ``RAND(seed)`` — MySQL seeds a per-row sequence tied to server
      evaluation order; Spark's ``rand(seed)`` is per-partition and
      row-order-dependent, so results would differ silently.
    - ``@var`` / ``@@sysvar`` — server session state Spark doesn't have.
    """
    sql, slots = _mask_literals(sql)
    if _SEEDED_RAND_RE.search(sql):
        raise UnsupportedMySQLConstruct(
            "RAND(seed) has per-row server-side sequence semantics that "
            "Spark cannot reproduce; use unseeded RAND() or precompute a "
            "deterministic hash column (e.g. xxhash64) instead"
        )
    var = _USER_VAR_RE.search(sql)
    if var:
        raise UnsupportedMySQLConstruct(
            f"user/system variable {var.group(0)!r} references MySQL "
            "server session state; inline the value into the query"
        )
    sql = _LIMIT_OFFSET_RE.sub(lambda m: f"LIMIT {m.group(2)} OFFSET {m.group(1)}", sql)

    def _iv(m: re.Match) -> str:
        fn, arg, n, unit = (
            m.group(1).upper(), m.group(2).strip(), m.group(3), m.group(4).upper()
        )
        op = "-" if fn in ("DATE_SUB", "SUBDATE") else "+"
        return f"({arg} {op} INTERVAL {n} {unit})"

    sql = _INTERVAL_FN_RE.sub(_iv, sql)

    def _fmt(m: re.Match) -> str:
        fn, arg = m.group(1).upper(), m.group(2).strip()
        pat = _translate_pattern(slots[int(m.group(3))][1:-1])
        if fn == "STR_TO_DATE":
            return f"TO_TIMESTAMP({arg}, '{pat}')"
        return f"DATE_FORMAT({arg}, '{pat}')"

    sql = _DATE_FORMAT_RE.sub(_fmt, sql)

    def _gc(m: re.Match) -> str:
        distinct, expr = m.group(1), m.group(2).strip()
        sep = slots[int(m.group(3))][1:-1] if m.group(3) is not None else ","
        collect = "collect_set" if distinct else "collect_list"
        return f"concat_ws('{sep}', sort_array({collect}({expr})))"

    return _unmask(_GROUP_CONCAT_RE.sub(_gc, sql), slots)
