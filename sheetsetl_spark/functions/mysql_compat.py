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
# Nondeterministic functions are evaluated ONCE by MySQL's SET but would
# re-evaluate per reference site under textual inlining — reject in SET.
_NONDET_SET_FN_RE = re.compile(
    r"\b(RAND|UUID|UUID_SHORT|SYSDATE|RANDOM_BYTES)\s*\(", re.IGNORECASE
)
# GROUP_CONCAT is rewritten by _render_group_concat (balanced-paren
# scanner — full ORDER BY / SEPARATOR / multi-expr grammar).
# Server-session-state functions (SURVEY B49 — out of scope by design):
# a clear rejection beats a Spark parse error or, worse, a silently
# different answer. Matched only as calls (name followed by '(').
_SERVER_STATE_FN_RE = re.compile(
    r"\b(FOUND_ROWS|LAST_INSERT_ID|ROW_COUNT|CONNECTION_ID|DATABASE|SCHEMA"
    r"|SESSION_USER|SYSTEM_USER|CURRENT_USER|USER|VERSION|UUID_SHORT|UUID"
    r"|SLEEP|GET_LOCK|RELEASE_LOCK|IS_FREE_LOCK|IS_USED_LOCK|BENCHMARK"
    r"|MASTER_POS_WAIT)\s*\(",
    re.IGNORECASE,
)
# SELECT ... INTO OUTFILE/DUMPFILE writes the MySQL SERVER's filesystem;
# SQL_CALC_FOUND_ROWS exists only to feed FOUND_ROWS() session state.
_INTO_OUTFILE_RE = re.compile(r"\bINTO\s+(OUTFILE|DUMPFILE)\b", re.IGNORECASE)
_CALC_FOUND_ROWS_RE = re.compile(r"\bSQL_CALC_FOUND_ROWS\b", re.IGNORECASE)
_CALL_RE = re.compile(r"^\s*CALL\b", re.IGNORECASE)
# Index hints tune the MySQL optimizer; Spark has no indexes — strip.
_INDEX_HINT_RE = re.compile(
    r"\b(USE|FORCE|IGNORE)\s+(INDEX|KEY)\s*(?:FOR\s+(?:JOIN|ORDER\s+BY|GROUP\s+BY)\s*)?"
    r"\([^()]*\)",
    re.IGNORECASE,
)
# SELECT modifiers that are pure server cache/priority knobs — strip.
_SELECT_MODIFIER_RE = re.compile(
    r"(\bSELECT\s+)(?:(?:SQL_NO_CACHE|SQL_CACHE|SQL_BUFFER_RESULT"
    r"|SQL_SMALL_RESULT|SQL_BIG_RESULT|HIGH_PRIORITY|STRAIGHT_JOIN)\s+)+",
    re.IGNORECASE,
)
# STRAIGHT_JOIN as a join keyword (a JOIN b) — plain inner join on Spark
# (AQE/Catalyst own join order; the hint has no meaning here).
_STRAIGHT_JOIN_RE = re.compile(r"\bSTRAIGHT_JOIN\b", re.IGNORECASE)
# MySQL's default || / && are LOGICAL operators (PIPES_AS_CONCAT off);
# Spark's || is string concat — a silent semantic flip if passed through.
_PIPE_OR_RE = re.compile(r"\|\|")
_AMP_AND_RE = re.compile(r"&&")
# Zero-arg now-family functions Spark spells differently.
_CURDATE_RE = re.compile(r"\bCURDATE\s*\(\s*\)", re.IGNORECASE)
# MySQL's bare STDDEV/STD/VARIANCE aggregates are POPULATION forms;
# Spark's are SAMPLE forms — numerically different on every input with
# n > 1, silently. Rewrite the bare names to the explicit _POP forms
# (the explicit *_POP/*_SAMP spellings agree across engines and are
# left alone — the pattern requires '(' right after the bare name).
_STDDEV_RE = re.compile(r"\b(?:STDDEV|STD)\s*\(", re.IGNORECASE)
_VARIANCE_RE = re.compile(r"\bVARIANCE\s*\(", re.IGNORECASE)
# MySQL JSON path operators: LHS is a (possibly qualified or masked-
# backtick) column, RHS must be a string-literal path (masked slot) —
# which keeps these patterns disjoint from Spark lambda `->` syntax.
_JSON_ARROW2_RE = re.compile(
    r"((?:[A-Za-z_][\w.]*)|(?:\x00\d+\x00))\s*->>\s*(\x00\d+\x00)"
)
_JSON_ARROW1_RE = re.compile(
    r"((?:[A-Za-z_][\w.]*)|(?:\x00\d+\x00))\s*->\s*(\x00\d+\x00)"
)
# Infix MOD (``a MOD b``) -> ``%``; the function form MOD(a, b) exists in
# Spark and is left alone (negative lookahead).
# Negative lookbehind for '.', '`', and word chars: ``t.mod`` / ``x.mod``
# are qualified identifiers, not the infix operator.
_MOD_INFIX_RE = re.compile(r"(?<![.\w`])MOD(?![\w`])(?!\s*\()", re.IGNORECASE)
# Unary BINARY (``WHERE BINARY col = 'x'``) forces case-sensitive
# comparison in MySQL's default ci collation; Spark comparisons are
# ALWAYS binary, so stripping the keyword preserves the intended
# semantics. ``CAST(x AS BINARY)`` is protected first (valid Spark).
_AS_BINARY_RE = re.compile(r"\bAS\s+BINARY\b", re.IGNORECASE)
# Simple operands (identifier chains, masked literals/backtick names)
# get WRAPPED in an explicit binary collation instead of stripped: in
# default binary mode that is a no-op, but over ci-collated views
# (register_views(case_insensitive=True)) it preserves the analyst's
# explicit case-SENSITIVE override — which is the entire point of
# writing BINARY on a ci server. Complex operands fall through to the
# strip (binary-mode-correct; rare in analyst SQL).
_BINARY_SIMPLE_RE = re.compile(
    r"\bBINARY\s+((?:\w+\.)*\w+|\x00\d+\x00)", re.IGNORECASE
)
_BINARY_OP_RE = re.compile(r"\bBINARY\s+", re.IGNORECASE)
_CURTIME_RE = re.compile(r"\bCURTIME\s*\(\s*\)", re.IGNORECASE)
_SYSDATE_RE = re.compile(r"\bSYSDATE\s*\(\s*\)", re.IGNORECASE)
# Longest-match-at-position alternation: a string consumes any '--' inside
# it, a comment consumes any quote inside it — whichever starts first wins.
# MySQL strings allow backslash escapes (\' \\ ...) and '' doubling; MySQL
# double-quoted strings are string literals too (ANSI_QUOTES off default).
# Backtick-quoted IDENTIFIERS are masked as well: they exist precisely to
# escape reserved names, so a column named `MOD` or `limit 1, 2` must
# never be touched by keyword rewrites (`` doubling = embedded backtick).
_STRING_OR_COMMENT_RE = re.compile(
    r"'(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.|\"\")*\"|`(?:[^`]|``)*`"
    r"|--[^\n]*|#[^\n]*|/\*.*?\*/",
    re.DOTALL,
)
# Preamble statements a folder-of-SQL file may carry that are cosmetic
# on Spark: USE <db> (one flat namespace here) and connection-charset
# SETs. Anything else stateful (SET time_zone, SET sql_mode, SET @v)
# REJECTS — silently ignoring those would change results.
_IGNORABLE_STMT_RE = re.compile(
    r"^\s*(?:USE\s+\S+|SET\s+(?:NAMES\s+\S+(?:\s+COLLATE\s+\S+)?"
    r"|(?:SESSION\s+)?(?:character_set_\w+|collation_\w+|sql_safe_updates"
    r"|net_read_timeout|net_write_timeout|max_execution_time)\s*=\s*\S+))\s*$",
    re.IGNORECASE,
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


# The pipeline is a read-only analytics runner (each file's RESULT SET
# becomes a sheet): only statements that produce one are accepted.
_READ_ONLY_RE = re.compile(r"^\s*(?:\(|SELECT\b|WITH\b|VALUES\b|TABLE\b)", re.IGNORECASE)


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

    Additional rewrites (all outside literals):

    - index hints (``USE/FORCE/IGNORE INDEX (...)``), ``STRAIGHT_JOIN``
      and cache/priority SELECT modifiers are stripped — optimizer knobs
      with no Spark meaning (Catalyst/AQE own the physical plan);
    - ``||`` -> ``OR`` and ``&&`` -> ``AND`` — MySQL's defaults are
      LOGICAL (PIPES_AS_CONCAT off); Spark's ``||`` is string concat, a
      silent semantic flip if passed through (use CONCAT() for strings);
    - ``CURDATE()/CURTIME()/SYSDATE()`` -> Spark spellings;
    - infix ``MOD`` -> ``%``; unary ``BINARY`` stripped (Spark compares
      binary already; ``CAST(x AS BINARY)`` preserved);
    - ``INSERT(s,pos,len,new)`` -> exact-semantics splice CASE;
      ``GREATEST/LEAST`` -> any-NULL-arg guard (MySQL returns NULL,
      Spark ignores NULLs — a silent flip otherwise);
      ``MONTHNAME/DAYNAME`` -> full-name DATE_FORMAT patterns;
      ``WEEK(d)`` (mode 0) -> Sunday-week CASE (explicit modes reject);
      ``TO_DAYS/FROM_DAYS`` -> day-number epoch arithmetic;
      ``FORMAT(x, d)`` -> ``FORMAT_NUMBER``.

    Rejected with :class:`UnsupportedMySQLConstruct` (no faithful Spark
    semantics exist; a clear error beats a silently-different answer):

    - ``RAND(seed)`` — MySQL seeds a per-row sequence tied to server
      evaluation order; Spark's ``rand(seed)`` is per-partition and
      row-order-dependent, so results would differ silently.
    - ``@var`` / ``@@sysvar`` — server session state Spark doesn't have.
      (At FILE level, :func:`mysql_file_to_spark_sql` translates the
      read-only constant case — ``SET @x := 42;`` chains — by inlining;
      only vars with no constant file-level assignment reach this
      rejection.)
    - server-state functions (``FOUND_ROWS, LAST_INSERT_ID, DATABASE,
      USER, VERSION, UUID, SLEEP, GET_LOCK, ...`` — the SURVEY B49
      class), ``SQL_CALC_FOUND_ROWS``, ``SELECT ... INTO OUTFILE`` and
      ``CALL proc`` (no stored programs).
    """
    sql, slots = _mask_literals(sql)
    # MySQL '#' line comments aren't Spark syntax — rewrite to '--'
    slots = [f"-- {s[1:].lstrip()}" if s.startswith("#") else s for s in slots]
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
    fn = _SERVER_STATE_FN_RE.search(sql)
    if fn:
        raise UnsupportedMySQLConstruct(
            f"{fn.group(1).upper()}() reads MySQL server/session state "
            "that has no Spark equivalent; remove it or inline a literal"
        )
    if _INTO_OUTFILE_RE.search(sql):
        raise UnsupportedMySQLConstruct(
            "SELECT ... INTO OUTFILE/DUMPFILE writes the MySQL server's "
            "local filesystem; use the pipeline's sink instead (the "
            "result of the final SELECT is written for you)"
        )
    if _CALC_FOUND_ROWS_RE.search(sql):
        raise UnsupportedMySQLConstruct(
            "SQL_CALC_FOUND_ROWS exists only to feed FOUND_ROWS() session "
            "state; run a separate COUNT(*) query instead"
        )
    if _CALL_RE.search(sql):
        raise UnsupportedMySQLConstruct(
            "CALL invokes a stored procedure; Spark has no stored "
            "programs — inline the procedure body as a query"
        )
    sql = _INDEX_HINT_RE.sub("", sql)
    sql = _SELECT_MODIFIER_RE.sub(r"\1", sql)
    sql = _STRAIGHT_JOIN_RE.sub("JOIN", sql)
    sql = _PIPE_OR_RE.sub(" OR ", sql)
    sql = _AMP_AND_RE.sub(" AND ", sql)
    sql = _CURDATE_RE.sub("CURRENT_DATE", sql)
    sql = _CURTIME_RE.sub("DATE_FORMAT(CURRENT_TIMESTAMP, 'HH:mm:ss')", sql)
    sql = _SYSDATE_RE.sub("CURRENT_TIMESTAMP", sql)
    sql = _STDDEV_RE.sub("STDDEV_POP(", sql)
    sql = _VARIANCE_RE.sub("VAR_POP(", sql)
    # ``col ->> '$.path'`` (text extraction) -> GET_JSON_OBJECT — exact:
    # both unquote scalar results. Runs BEFORE any renderer that emits
    # Spark lambdas (whose `->` must not be confused with the JSON op;
    # the literal-path requirement keeps the patterns disjoint anyway).
    sql = _JSON_ARROW2_RE.sub(lambda m: f"GET_JSON_OBJECT({m.group(1)}, {m.group(2)})", sql)
    m_arrow = _JSON_ARROW1_RE.search(sql)
    if m_arrow:
        raise UnsupportedMySQLConstruct(
            "col -> '$.path' returns QUOTED JSON ('\"v\"'), which Spark's "
            "text extraction would silently unquote; use ->> (or "
            "JSON_UNQUOTE(JSON_EXTRACT(...))) for text, or restructure "
            "around GET_JSON_OBJECT"
        )
    sql = _MOD_INFIX_RE.sub("%", sql)
    sql = _AS_BINARY_RE.sub("\x01AS_BINARY\x01", sql)
    sql = _BINARY_SIMPLE_RE.sub(lambda m: f"COLLATE({m.group(1)}, 'UTF8_BINARY')", sql)
    sql = _BINARY_OP_RE.sub("", sql)
    sql = sql.replace("\x01AS_BINARY\x01", "AS BINARY")
    sql = _rewrite_mysql_fn_calls(sql)
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

    sql = _rewrite_call(sql, "GROUP_CONCAT", _render_group_concat(slots), raw=True)
    return _unmask(sql, slots)


def split_statements(sql: str) -> list[str]:
    """Split a .sql file into its ';'-terminated statements, ignoring
    semicolons inside string literals and comments (real analyst files
    often carry a USE/SET preamble before the SELECT). Parts containing
    only comments/whitespace are dropped — they aren't statements."""
    masked, slots = _mask_literals(sql)
    out = []
    for part in masked.split(";"):
        # blank once comment slots are removed => not a statement
        without_comments = re.sub(
            r"\x00(\d+)\x00",
            lambda m: "" if slots[int(m.group(1))][0] in "-#/" else m.group(0),
            part,
        )
        if without_comments.strip():
            out.append(_unmask(part, slots).strip())
    return out


def _rewrite_call(sql: str, name: str, render, raw: bool = False) -> str:
    """Rewrite every ``name(args...)`` call in MASKED text (literals are
    slot tokens, so a string containing 'NAME(' is never touched) via
    ``render(args: list[str]) -> str | None`` — None leaves the call
    as written. Arguments are recursively rewritten first, so nested
    calls of the same function translate inside-out. With ``raw=True``
    the renderer receives ``[inner_text]`` unsplit (for grammars whose
    top-level commas are clause syntax, e.g. GROUP_CONCAT's ORDER BY
    key list)."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    out, i = [], 0
    while True:
        m = pat.search(sql, i)
        if m is None:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i : m.start()])
        op = sql.index("(", m.start())
        j = _skip_balanced(sql, op)
        if j < 0:  # unbalanced: leave for the SQL parser's own error
            out.append(sql[m.start() :])
            return "".join(out)
        inner = sql[op + 1 : j - 1]
        if raw:
            args = [_rewrite_call(inner, name, render, raw=True)]
        else:
            args = [
                _rewrite_call(a.strip(), name, render)
                for a in _split_top_level_commas(inner)
            ]
        rendered = render(args)
        out.append(sql[m.start() : j] if rendered is None else rendered)
        i = j


def _top_level_search(s: str, pattern: re.Pattern) -> re.Match | None:
    """First ``pattern`` match sitting at parenthesis depth 0 of ``s``."""
    depth = [0] * (len(s) + 1)
    d = 0
    for i, ch in enumerate(s):
        if ch == "(":
            d += 1
        elif ch == ")":
            d -= 1
        depth[i + 1] = d
    for m in pattern.finditer(s):
        if depth[m.start()] == 0:
            return m
    return None


def _render_insert_fn(args: list[str]) -> str | None:
    """MySQL ``INSERT(str, pos, len, newstr)`` string splice -> CASE over
    CHAR_LENGTH/SUBSTRING/CONCAT with MySQL's exact boundary semantics:
    original string when pos is out of range, replace-to-end when len is
    negative or runs past the end, NULL in = NULL out."""
    if len(args) != 4:
        return None
    s_, p_, l_, n_ = args
    return (
        f"CASE WHEN ({p_}) < 1 OR ({p_}) > CHAR_LENGTH({s_}) THEN ({s_})"
        f" WHEN ({l_}) < 0 OR ({p_}) + ({l_}) > CHAR_LENGTH({s_})"
        f" THEN CONCAT(SUBSTRING(({s_}), 1, ({p_}) - 1), ({n_}))"
        f" ELSE CONCAT(SUBSTRING(({s_}), 1, ({p_}) - 1), ({n_}),"
        f" SUBSTRING(({s_}), ({p_}) + ({l_}))) END"
    )


def _render_null_strict(spark_fn: str):
    """MySQL GREATEST/LEAST return NULL when ANY argument is NULL; Spark
    IGNORES NULL arguments — a silent cross-engine answer flip. Wrap the
    Spark call in an any-arg-NULL guard."""

    def render(args: list[str]) -> str | None:
        if len(args) < 2:
            return None
        nulls = " OR ".join(f"({a}) IS NULL" for a in args)
        return (
            f"CASE WHEN {nulls} THEN NULL"
            f" ELSE {spark_fn}({', '.join(args)}) END"
        )

    return render


def _render_week(args: list[str]) -> str | None:
    """MySQL ``WEEK(d[, mode])`` for all 8 modes (default 0).

    Decomposition of MySQL's ``calc_week`` (sql/sql_time.cc) into a
    week-start/anchor formulation, property-tested against an
    independent Python port of the C algorithm
    (tests/test_functions.py::test_week_all_modes_property):

    - start day ``s0``: Monday for odd modes, Sunday for even
      (DAYOFWEEK: Sun=1, so s0 = 2 or 1);
    - ``week_start(x) = x - ((DAYOFWEEK(x) - s0) mod 7)``;
    - week 1 of year y starts at ``anchor(jan1) = week_start(jan1+k-1)``
      where ``k = 4`` for ">= 4 days in the year" modes (1,3,4,6) and
      ``k = 7`` for "contains the year's first start-day" modes
      (0,2,5,7) — after MySQL's week_mode() bit-flip for Sunday modes;
    - ``w = floor((week_start(d) - anchor(jan1)) / 7) + 1``;
    - days before week 1: modes without the WEEK_YEAR bit (0,1,4,5)
      return 0; WEEK_YEAR modes (2,3,6,7) return the week number
      against the PREVIOUS year's anchor (52/53);
    - WEEK_YEAR modes additionally re-assign a trailing week whose
      start reaches the NEXT year's anchor to week 1.

    The mode must be an integer literal 0-7 (analyst corpora always
    write it literally; a column-valued mode rejects)."""
    if len(args) not in (1, 2):
        return None
    mode = _week_mode_literal("WEEK", args)
    monday_first = bool(mode & 1)
    week_year = bool(mode & 2)
    p = _week_parts(args[0], mode)
    if week_year:
        return (
            f"CASE WHEN {p['d']} IS NULL THEN NULL"
            f" WHEN {p['before_w1']} THEN {p['w_prev']}"
            f" WHEN {p['into_next']} THEN 1"
            f" ELSE {p['w_this']} END"
        )
    return (
        f"CASE WHEN {p['d']} IS NULL THEN NULL"
        f" WHEN {p['before_w1']} THEN 0"
        f" ELSE {p['w_this']} END"
    )


def _week_mode_literal(fn: str, args: list[str]) -> int:
    if len(args) == 2:
        mode_txt = args[1].strip()
        if not re.fullmatch(r"[0-7]", mode_txt):
            raise UnsupportedMySQLConstruct(
                f"{fn}(date, mode) requires a literal mode 0-7, got "
                f"{mode_txt!r}"
            )
        return int(mode_txt)
    return 0


def _week_parts(arg: str, mode: int) -> dict[str, str]:
    """Shared fragments for WEEK/YEARWEEK: week starts, year anchors,
    and the three week numbers (this/prev year, next-year predicate)."""
    monday_first = bool(mode & 1)
    first_weekday = bool(mode & 4)
    if not monday_first:  # MySQL week_mode(): flip for Sunday-first
        first_weekday = not first_weekday
    s0 = 2 if monday_first else 1
    k = 7 if first_weekday else 4

    d = f"CAST({arg} AS DATE)"
    jan1 = f"TRUNC({d}, 'YEAR')"

    def ws(x: str) -> str:
        return f"DATE_SUB({x}, PMOD(DAYOFWEEK({x}) - {s0}, 7))"

    def anchor(j: str) -> str:
        return ws(f"DATE_ADD({j}, {k - 1})")

    wsd = ws(d)
    prev = anchor(f"ADD_MONTHS({jan1}, -12)")
    nxt = anchor(f"ADD_MONTHS({jan1}, 12)")
    return {
        "d": d,
        "before_w1": f"DATEDIFF({wsd}, {anchor(jan1)}) < 0",
        "into_next": f"DATEDIFF({wsd}, {nxt}) >= 0",
        "w_this": f"CAST(FLOOR(DATEDIFF({wsd}, {anchor(jan1)}) / 7) + 1 AS INT)",
        "w_prev": f"CAST(FLOOR(DATEDIFF({wsd}, {prev}) / 7) + 1 AS INT)",
    }


def _render_yearweek(args: list[str]) -> str | None:
    """MySQL ``YEARWEEK(d[, mode])`` -> owning_year*100 + week. MySQL
    forces the WEEK_YEAR bit regardless of mode (calc_week is called
    with ``week_mode(mode) | WEEK_YEAR``), so YEARWEEK never returns
    week 0: boundary days carry the ADJACENT year's numbering
    (YEARWEEK('1995-01-01') = 199452)."""
    if len(args) not in (1, 2):
        return None
    mode = _week_mode_literal("YEARWEEK", args)
    p = _week_parts(args[0], mode | 2)
    y = f"YEAR({p['d']})"
    return (
        f"CASE WHEN {p['d']} IS NULL THEN NULL"
        f" WHEN {p['before_w1']} THEN ({y} - 1) * 100 + {p['w_prev']}"
        f" WHEN {p['into_next']} THEN ({y} + 1) * 100 + 1"
        f" ELSE {y} * 100 + {p['w_this']} END"
    )


_GC_ORDER_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_GC_SEP_RE = re.compile(r"\bSEPARATOR\s+(\x00(\d+)\x00|\S+)\s*$", re.IGNORECASE)


def _render_group_concat(slots: list[str]):
    """GROUP_CONCAT([DISTINCT] expr[, expr...] [ORDER BY k [ASC|DESC],
    ...] [SEPARATOR s]) with full clause parsing (balanced parens, so
    function-call arguments work). Without ORDER BY the output is
    determinized by sorting the values (the repo's long-standing
    contract); with ORDER BY the requested keys apply — per-key
    ASC/DESC, MySQL NULL ordering (first when ASC, last when DESC) —
    and the value itself is the final tie-break, making ties
    deterministic where MySQL leaves them server-ordered."""

    def render(args: list[str]) -> str | None:
        s = args[0].strip()
        distinct = bool(re.match(r"^DISTINCT\b", s, re.IGNORECASE))
        if distinct:
            s = s[8:].lstrip()
        sep = ","
        msep = _top_level_search(s, _GC_SEP_RE)
        if msep:
            if msep.group(2) is None:
                raise UnsupportedMySQLConstruct(
                    "GROUP_CONCAT SEPARATOR must be a string literal"
                )
            sep = slots[int(msep.group(2))][1:-1]
            s = s[: msep.start()].rstrip()
        order = None
        mo = _top_level_search(s, _GC_ORDER_RE)
        if mo:
            order = s[mo.end() :].strip()
            s = s[: mo.start()].rstrip()
        vals = [a.strip() for a in _split_top_level_commas(s)]
        value = vals[0] if len(vals) == 1 else f"CONCAT({', '.join(vals)})"
        if order is None:
            collect = "collect_set" if distinct else "collect_list"
            return f"concat_ws('{sep}', sort_array({collect}({value})))"
        keys: list[tuple[str, bool]] = []
        for part in _split_top_level_commas(order):
            part = part.strip()
            md = re.search(r"\s+(ASC|DESC)\s*$", part, re.IGNORECASE)
            if md:
                keys.append((part[: md.start()].strip(), md.group(1).upper() == "ASC"))
            else:
                keys.append((part, True))
        if len(keys) == 1 and keys[0][0] == value:
            flag = "" if keys[0][1] else ", false"
            collect = "collect_set" if distinct else "collect_list"
            return f"concat_ws('{sep}', sort_array({collect}({value}){flag}))"
        if distinct:
            raise UnsupportedMySQLConstruct(
                "GROUP_CONCAT(DISTINCT x ORDER BY <other key>) is ambiguous "
                "(one distinct value can pair with many key values); order "
                "by the expression itself or drop DISTINCT"
            )
        fields = [f"({k}) AS gck{i}" for i, (k, _) in enumerate(keys)]
        fields.append(f"({value}) AS gcv")
        branches = []
        for i, (_, asc) in enumerate(keys + [("<value>", True)]):
            f = "gcv" if i == len(keys) else f"gck{i}"
            lo, hi = ("-1", "1") if asc else ("1", "-1")
            branches += [
                f"WHEN l.{f} IS NULL AND r.{f} IS NOT NULL THEN {lo}",
                f"WHEN l.{f} IS NOT NULL AND r.{f} IS NULL THEN {hi}",
                f"WHEN l.{f} < r.{f} THEN {lo}",
                f"WHEN l.{f} > r.{f} THEN {hi}",
            ]
        cmp = f"(l, r) -> CASE {' '.join(branches)} ELSE 0 END"
        arr = f"array_sort(collect_list(STRUCT({', '.join(fields)})), {cmp})"
        return f"concat_ws('{sep}', transform({arr}, x -> CAST(x.gcv AS STRING)))"

    return render


def _render_json_unquote(args: list[str]) -> str | None:
    """``JSON_UNQUOTE(JSON_EXTRACT(doc, path))`` — the MySQL text-
    extraction composite — is exactly GET_JSON_OBJECT."""
    if len(args) != 1:
        return None
    m = re.match(
        r"^JSON_EXTRACT\s*\((.*)\)$", args[0].strip(), re.IGNORECASE | re.DOTALL
    )
    if not m:
        return None  # standalone JSON_UNQUOTE: no Spark twin — loud parse error
    inner = _split_top_level_commas(m.group(1))
    if len(inner) != 2:
        return None
    return f"GET_JSON_OBJECT({inner[0].strip()}, {inner[1].strip()})"


def _render_json_extract(args: list[str]):
    if len(args) == 2:
        raise UnsupportedMySQLConstruct(
            "JSON_EXTRACT returns QUOTED JSON ('\"v\"'), which Spark's "
            "text extraction would silently unquote; use ->> or "
            "JSON_UNQUOTE(JSON_EXTRACT(...)) — both translate to "
            "GET_JSON_OBJECT"
        )
    return None


def _rewrite_mysql_fn_calls(sql: str) -> str:
    """All argument-structural function rewrites (masked text)."""
    sql = _rewrite_call(sql, "JSON_UNQUOTE", _render_json_unquote)
    sql = _rewrite_call(sql, "JSON_EXTRACT", _render_json_extract)
    sql = _rewrite_call(sql, "INSERT", _render_insert_fn)
    sql = _rewrite_call(sql, "GREATEST", _render_null_strict("GREATEST"))
    sql = _rewrite_call(sql, "LEAST", _render_null_strict("LEAST"))
    sql = _rewrite_call(sql, "YEARWEEK", _render_yearweek)
    sql = _rewrite_call(sql, "WEEK", _render_week)
    sql = _rewrite_call(
        sql,
        "MONTHNAME",
        lambda a: f"DATE_FORMAT({a[0]}, 'MMMM')" if len(a) == 1 else None,
    )
    sql = _rewrite_call(
        sql,
        "DAYNAME",
        lambda a: f"DATE_FORMAT({a[0]}, 'EEEE')" if len(a) == 1 else None,
    )
    sql = _rewrite_call(
        sql,
        "TO_DAYS",
        lambda a: (
            f"(DATEDIFF(CAST({a[0]} AS DATE), DATE '1970-01-01') + 719528)"
            if len(a) == 1
            else None
        ),
    )
    sql = _rewrite_call(
        sql,
        "FROM_DAYS",
        lambda a: (
            f"DATE_ADD(DATE '1970-01-01', CAST(({a[0]}) - 719528 AS INT))"
            if len(a) == 1
            else None
        ),
    )
    sql = _rewrite_call(
        sql,
        "FORMAT",
        lambda a: f"FORMAT_NUMBER({a[0]}, {a[1]})" if len(a) == 2 else None,
    )
    sql = _rewrite_call(
        sql,
        "STRCMP",
        lambda a: (
            f"CASE WHEN ({a[0]}) < ({a[1]}) THEN -1"
            f" WHEN ({a[0]}) > ({a[1]}) THEN 1"
            f" WHEN ({a[0]}) = ({a[1]}) THEN 0 END"
            if len(a) == 2
            else None
        ),
    )
    sql = _rewrite_call(
        sql,
        "OCT",
        lambda a: (
            f"CONV(CAST({a[0]} AS STRING), 10, 8)" if len(a) == 1 else None
        ),
    )
    return sql


def _split_top_level_commas(s: str) -> list[str]:
    """Split on commas outside parentheses (literals already masked)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _apply_var_assignments(stmt: str, env: dict[str, str]) -> None:
    """Fold one ``SET @a := expr[, @b := expr ...]`` statement into
    ``env`` (variable name -> expanded constant SQL text).

    Only the read-only monotonic case translates — constant expressions,
    possibly chaining earlier @vars (expanded at assignment time, so
    sequential MySQL semantics hold even under re-assignment). Anything
    that READS state at assignment time (a subquery, a @@sysvar, an
    unassigned @var) rejects with an actionable message."""
    masked, slots = _mask_literals(stmt)
    body = re.sub(r"^\s*SET\b", "", masked, flags=re.IGNORECASE)
    for part in _split_top_level_commas(body):
        m = re.match(r"^\s*@(\w+)\s*(?::=|=)\s*(.+?)\s*$", part, re.DOTALL)
        if not m:
            head = " ".join(_unmask(part, slots).split())[:60]
            raise UnsupportedMySQLConstruct(
                f"unsupported SET assignment {head!r}; only constant "
                "user-variable assignments (SET @x := <literal "
                "expression>) are translated"
            )
        name, expr = m.group(1), m.group(2)
        if re.search(r"\bSELECT\b", expr, re.IGNORECASE):
            raise UnsupportedMySQLConstruct(
                f"SET @{name} := (SELECT ...) reads tables at assignment "
                "time (MySQL evaluates it once, against server state); "
                "inline the subquery into the main query instead"
            )
        if "@@" in expr:
            raise UnsupportedMySQLConstruct(
                f"SET @{name} reads a @@system variable — MySQL server "
                "state Spark does not have; inline the intended value"
            )
        # MySQL evaluates SET once (one value per session); this translator
        # inlines the expression TEXT into every reference site, so a
        # nondeterministic expression would re-evaluate per reference —
        # a silently different answer. Reject rather than silently differ.
        nondet = _NONDET_SET_FN_RE.search(expr)
        if nondet:
            raise UnsupportedMySQLConstruct(
                f"SET @{name} := ...{nondet.group(1).upper()}()... is "
                "nondeterministic: MySQL evaluates SET once per session, "
                "but this translator inlines the expression per reference "
                "site, which would re-evaluate it per row; precompute a "
                "literal value instead"
            )

        def _chain(mm: re.Match, _n: str = name) -> str:
            ref = mm.group(0)[1:]
            if ref not in env:
                raise UnsupportedMySQLConstruct(
                    f"user variable @{ref} referenced (in SET @{_n}) "
                    "before any constant assignment"
                )
            return f"({env[ref]})"

        expr = re.sub(r"@\w+", _chain, expr)
        env[name] = _unmask(expr, slots).strip()


def _substitute_user_vars(stmt: str, env: dict[str, str]) -> str:
    """Inline file-level constant @var assignments into the result
    statement. Assignment-in-SELECT (``@rt := @rt + x`` — MySQL's
    running-total idiom, whose value depends on server row order)
    rejects; @@sysvars and vars never assigned are left in place for
    :func:`mysql_to_spark_sql`'s rejection backstop."""
    masked, slots = _mask_literals(stmt)
    m = re.search(r"@\w+\s*:=", masked)
    if m:
        raise UnsupportedMySQLConstruct(
            f"assignment {m.group(0).strip()!r} inside a SELECT mutates "
            "per-row session state in server evaluation order (the MySQL "
            "running-total idiom); use a window function "
            "(SUM(...) OVER (ORDER BY ...)) instead"
        )

    def repl(mm: re.Match) -> str:
        tok = mm.group(0)
        if tok.startswith("@@") or tok[1:] not in env:
            return tok
        return f"({env[tok[1:]]})"

    return _unmask(re.sub(r"@{1,2}\w+", repl, masked), slots)


def mysql_file_to_spark_sql(sql: str) -> str:
    """Translate a whole analyst .sql FILE: tolerate a cosmetic preamble
    (``USE db;`` / ``SET NAMES ...;`` — no-ops against the Spark catalog),
    fold constant user-variable assignments (``SET @x := 42;`` chains,
    the most common 5.7-era analyst-folder construct) into the query by
    inlining, then translate the single result-producing statement.

    Multiple result statements reject (the pipeline writes ONE sheet per
    file — the reference's contract, loader.py:152); stateful SETs
    (time_zone, sql_mode), non-constant @var assignments, and
    assignment-in-SELECT reject rather than silently changing results.
    Each rejection message names the offending statement so the per-file
    error log (runner.py sql_error) is actionable."""
    stmts = split_statements(sql)
    if not stmts:
        raise UnsupportedMySQLConstruct("file contains no SQL statements")
    body = [s for s in stmts if not _IGNORABLE_STMT_RE.match(s)]
    env: dict[str, str] = {}
    rest: list[str] = []
    for s in body:
        first = _without_leading_comments(s)
        if re.match(r"^\s*SET\s+@(?!@)", first, re.IGNORECASE):
            if rest:
                # MySQL executes sequentially: an assignment AFTER the
                # result statement cannot affect it — folding it would
                # invert the file's semantics, so reject instead
                raise UnsupportedMySQLConstruct(
                    f"SET statement {' '.join(first.split())[:60]!r} "
                    "appears after the result statement; move variable "
                    "assignments before the query"
                )
            _apply_var_assignments(first, env)
        else:
            rest.append(s)
    body = rest
    if not body:
        raise UnsupportedMySQLConstruct(
            "file contains only USE/SET preamble statements and no query"
        )
    for s in body:
        first = _without_leading_comments(s)
        violation = _read_only_violation(s)
        if (
            violation is not None
            # SET and CALL get their own, more specific rejections below /
            # in mysql_to_spark_sql
            and not re.match(r"^\s*(SET|CALL)\b", first, re.IGNORECASE)
        ):
            raise UnsupportedMySQLConstruct(
                f"statement {violation!r} is not a read-only query; the "
                "pipeline executes SELECT/WITH/VALUES only (DML/DDL would "
                "mutate engine state instead of producing a sheet)"
            )
        if re.match(r"^\s*SET\b", first, re.IGNORECASE):
            raise UnsupportedMySQLConstruct(
                f"stateful SET statement {' '.join(s.split())[:60]!r} "
                "would change result semantics (time_zone/sql_mode are "
                "MySQL session state); inline the intended behavior "
                "into the query"
            )
    if len(body) > 1:
        head = " ".join(body[0].split())[:60]
        raise UnsupportedMySQLConstruct(
            f"file contains {len(body)} result statements (first: "
            f"{head!r}...); the pipeline writes one result per file — "
            "split it into one file per statement"
        )
    stmt = body[0]
    if env or "@" in stmt:
        stmt = _substitute_user_vars(stmt, env)
    return mysql_to_spark_sql(stmt)


def _without_leading_comments(stmt: str) -> str:
    """The statement minus leading comments/whitespace, so its first real
    token decides what it is."""
    masked, slots = _mask_literals(stmt)
    i = 0
    while True:
        m = re.match(r"\s*\x00(\d+)\x00", masked[i:])
        if m and slots[int(m.group(1))][0] in "-#/":
            i += m.end()
            continue
        break
    return _unmask(masked[i:], slots).lstrip()


# CTE-list scanning for the read-only guard: both Spark and MySQL 8
# accept CTE-PREFIXED DML ("WITH t AS (SELECT 1) INSERT INTO ..."), so
# checking only the first keyword would let a WITH-wrapped INSERT
# execute. The guard therefore parses past the CTE definitions and
# requires the MAIN statement body to be a query too.
# A CTE name: bare word, backtick-quoted (appears as a mask token once
# literals/identifiers are masked), or the mask token itself.
_IDENT_RE = re.compile(r"[A-Za-z_][\w$]*|`[^`]+`|\x00\d+\x00")


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _skip_balanced(s: str, i: int) -> int:
    """``s[i]`` must be '('; return the index just past its matching ')'
    or -1 if unbalanced. Literals/comments are already masked, so every
    paren in ``s`` is structural."""
    depth = 0
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return -1


def _main_statement_after_ctes(stmt: str) -> str:
    """For a WITH-prefixed statement, the text AFTER the CTE definition
    list (the main body whose first keyword decides read-only-ness);
    for anything else, the statement minus leading comments. Returns ''
    when the CTE list cannot be parsed — callers treat that as
    not-read-only (conservative: reject rather than execute)."""
    masked, slots = _mask_literals(stmt)
    # comments can't hide keywords from the guard: blank them out
    s = re.sub(
        r"\x00(\d+)\x00",
        lambda m: " " if slots[int(m.group(1))][0] in "-#/" else m.group(0),
        masked,
    )
    m = re.match(r"\s*WITH\b(?:\s+RECURSIVE\b)?", s, re.IGNORECASE)
    if not m:
        return _unmask(s, slots).lstrip()
    i = m.end()
    while True:
        i = _skip_ws(s, i)
        mm = _IDENT_RE.match(s, i)  # CTE name
        if not mm:
            return ""
        i = _skip_ws(s, mm.end())
        if i < len(s) and s[i] == "(":  # optional (column list)
            i = _skip_balanced(s, i)
            if i < 0:
                return ""
            i = _skip_ws(s, i)
        mm = re.match(r"AS\b", s[i:], re.IGNORECASE)
        if not mm:
            return ""
        i = _skip_ws(s, i + mm.end())
        if i >= len(s) or s[i] != "(":  # CTE body
            return ""
        i = _skip_balanced(s, i)
        if i < 0:
            return ""
        i = _skip_ws(s, i)
        if i < len(s) and s[i] == ",":
            i += 1
            continue
        return _unmask(s[i:], slots).lstrip()


#: What a WITH's main body may start with: a query, never another WITH
#: (top-level WITH-after-WITH is invalid in both engines) and never DML.
_MAIN_BODY_RE = re.compile(r"^\s*(?:\(|SELECT\b|VALUES\b|TABLE\b)", re.IGNORECASE)


def _read_only_violation(stmt: str) -> str | None:
    """None if ``stmt`` is a read-only query; else the offending head
    text for the error message. WITH-prefixed statements are checked
    BOTH at the first keyword and at the main body after the CTE list,
    so 'WITH t AS (SELECT 1) INSERT INTO ...' (CTE-prefixed DML, legal
    in Spark and MySQL 8) is rejected like bare INSERT."""
    first = _without_leading_comments(stmt)
    if not _READ_ONLY_RE.match(first):
        return " ".join(first.split())[:60]
    if re.match(r"\s*WITH\b", first, re.IGNORECASE):
        main = _main_statement_after_ctes(stmt)
        if not _MAIN_BODY_RE.match(main):
            return " ".join(main.split())[:60] or " ".join(first.split())[:60]
    return None


def ensure_read_only(sql: str) -> None:
    """Reject non-query SQL (DML/DDL) with a clear error — used by the
    pipeline shell for Spark-dialect files, where ``spark.sql`` would
    otherwise EXECUTE an INSERT/CREATE/DROP and mutate engine state
    instead of producing a result sheet. CTE-prefixed DML
    ('WITH ... INSERT INTO ...') is caught by scanning past the CTE
    list to the main statement body."""
    head = _read_only_violation(sql)
    if head is not None:
        raise UnsupportedMySQLConstruct(
            f"statement {head!r} is not a read-only query; the pipeline "
            "executes SELECT/WITH/VALUES only (DML/DDL would mutate "
            "engine state instead of producing a sheet)"
        )
