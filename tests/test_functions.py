"""MySQL-compat layer: expression helpers + SQL text translator."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sheetsetl_spark.catalog import register_views
from sheetsetl_spark.functions import (
    date_format_mysql,
    group_concat,
    if_,
    ifnull,
    mysql_to_spark_sql,
    truncate_number,
)
from tests.conftest import SF_SMALL


def test_group_concat(spark):
    register_views(spark, SF_SMALL, ("nation",))
    row = (
        spark.table("nation")
        .filter("n_nationkey < 3")
        .agg(group_concat("n_name", sep="|").alias("g"))
        .first()
    )
    assert row["g"] == "NATION_0|NATION_1|NATION_2"


def test_if_ifnull_truncate(spark):
    df = spark.range(1).select(
        if_(F.lit(1) > 0, F.lit("y"), F.lit("n")).alias("i"),
        ifnull(F.lit(None).cast("string"), "d").alias("n"),
        truncate_number(F.lit(-1.987), 2).alias("t_neg"),
        truncate_number(F.lit(1.987), 1).alias("t_pos"),
    )
    row = df.first()
    assert row["i"] == "y" and row["n"] == "d"
    assert row["t_neg"] == -1.98 and row["t_pos"] == 1.9  # toward zero


def test_date_format_mysql(spark):
    register_views(spark, SF_SMALL, ("orders",))
    row = (
        spark.table("orders")
        .select(date_format_mysql(F.to_timestamp(F.lit("1995-03-07 08:09:10")), "%Y-%m-%d %H:%i:%s").alias("f"))
        .first()
    )
    assert row["f"] == "1995-03-07 08:09:10"


def test_translator_limit_offset(spark):
    register_views(spark, SF_SMALL, ("orders",))
    sql = mysql_to_spark_sql("SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10, 5")
    assert "LIMIT 5 OFFSET 10" in sql
    keys = [r[0] for r in spark.sql(sql).collect()]
    want = [r[0] for r in spark.sql(
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey"
    ).collect()][10:15]
    assert keys == want


def test_translator_date_format_and_group_concat(spark):
    register_views(spark, SF_SMALL, ("orders", "nation"))
    sql = mysql_to_spark_sql(
        "SELECT DATE_FORMAT(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS c "
        "FROM orders GROUP BY DATE_FORMAT(o_orderdate, '%Y-%m') LIMIT 1"
    )
    assert "%Y" not in sql
    assert spark.sql(sql).count() == 1

    sql2 = mysql_to_spark_sql(
        "SELECT GROUP_CONCAT(n_name SEPARATOR '|') AS g FROM nation WHERE n_nationkey < 2"
    )
    assert spark.sql(sql2).first()["g"] == "NATION_0|NATION_1"

    # passthrough: valid Spark SQL is untouched
    s = "SELECT 1 AS x"
    assert mysql_to_spark_sql(s) == s


def test_ns_catalog_preepoch_parity(spark, tmp_path):
    """The ns->us conversion in catalog.load_table must agree with
    DuckDB's TIMESTAMP_NS -> TIMESTAMP cast for PRE-epoch values too.
    Both engines truncate toward zero (measured; not floor)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sheetsetl_spark.catalog import load_table

    vals = [1234, -1234, 1_500_000_123_456, -1_500_000_123_456, 0, -1, 999, -999]
    path = str(tmp_path / "events.parquet")
    pq.write_table(
        pa.table(
            {"user_id": list(range(len(vals))), "ts": pa.array(vals, type=pa.timestamp("ns"))}
        ),
        path,
    )
    got = [
        r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f")
        for r in load_table(spark, str(tmp_path), "events").orderBy("user_id").collect()
    ]
    con = duckdb.connect()
    want = [
        r[0].strftime("%Y-%m-%d %H:%M:%S.%f")
        for r in con.execute(
            f"SELECT CAST(ts AS TIMESTAMP) FROM read_parquet('{path}') ORDER BY user_id"
        ).fetchall()
    ]
    assert got == want


def test_translator_masks_literals_and_comments():
    # keywords inside string literals are never rewritten
    s = "SELECT * FROM t WHERE note = 'see LIMIT 1, 2' LIMIT 3, 4"
    assert mysql_to_spark_sql(s) == (
        "SELECT * FROM t WHERE note = 'see LIMIT 1, 2' LIMIT 4 OFFSET 3"
    )
    # ... nor inside -- or /* */ comments
    s2 = "SELECT 1 -- LIMIT 5, 6\nFROM t /* GROUP_CONCAT(x) */ LIMIT 1, 2"
    assert mysql_to_spark_sql(s2) == (
        "SELECT 1 -- LIMIT 5, 6\nFROM t /* GROUP_CONCAT(x) */ LIMIT 2 OFFSET 1"
    )
    # literal rewrites still work when they SHOULD fire
    s3 = "SELECT DATE_FORMAT(d, '%Y-%m') FROM t WHERE x = 'DATE_FORMAT(d, ''%d'')'"
    out = mysql_to_spark_sql(s3)
    assert out.startswith("SELECT DATE_FORMAT(d, 'yyyy-MM')")
    assert "'DATE_FORMAT(d, ''%d'')'" in out


def test_translator_interval_arithmetic(spark):
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    out = mysql_to_spark_sql(
        "SELECT DATE_ADD(o_orderdate, INTERVAL 3 MONTH) AS a, "
        "DATE_SUB(o_orderdate, INTERVAL 7 DAY) AS b, "
        "ADDDATE(o_orderdate, INTERVAL 1 YEAR) AS c FROM orders LIMIT 1"
    )
    assert "(o_orderdate + INTERVAL 3 MONTH)" in out
    assert "(o_orderdate - INTERVAL 7 DAY)" in out
    assert "(o_orderdate + INTERVAL 1 YEAR)" in out
    spark.sql(f"SELECT 1 WHERE EXISTS (SELECT * FROM VALUES (1))")  # session alive
    row = spark.sql(
        "SELECT (TIMESTAMP '1995-01-01' + INTERVAL 3 MONTH) AS t"
    ).collect()[0]
    assert str(row["t"]).startswith("1995-04-01")


def test_translator_rejects_seeded_rand_and_user_vars():
    import pytest as _pytest

    from sheetsetl_spark.functions.mysql_compat import (
        UnsupportedMySQLConstruct,
        mysql_to_spark_sql,
    )

    with _pytest.raises(UnsupportedMySQLConstruct, match="RAND"):
        mysql_to_spark_sql("SELECT RAND(42) FROM orders")
    with _pytest.raises(UnsupportedMySQLConstruct, match="variable"):
        mysql_to_spark_sql("SELECT @total := @total + o_totalprice FROM orders")
    with _pytest.raises(UnsupportedMySQLConstruct, match="variable"):
        mysql_to_spark_sql("SELECT @@session.sql_mode")
    # unseeded RAND() and literals containing the patterns pass through
    assert mysql_to_spark_sql("SELECT RAND() AS r") == "SELECT RAND() AS r"
    s = "SELECT 'use RAND(7) or @x' AS note"
    assert mysql_to_spark_sql(s) == s


def test_translator_nested_first_arg():
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    out = mysql_to_spark_sql(
        "SELECT DATE_FORMAT(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d, "
        "DATE_ADD(STR_TO_DATE('1995-01-01', '%Y-%m-%d'), INTERVAL 3 MONTH) AS m"
    )
    assert "DATE_FORMAT(CAST(o_orderdate AS DATE), 'yyyy-MM-dd')" in out
    assert "(TO_TIMESTAMP('1995-01-01', 'yyyy-MM-dd') + INTERVAL 3 MONTH)" in out


# --- round-5 translator widening ------------------------------------------


def test_split_statements_respects_literals_and_comments():
    from sheetsetl_spark.functions.mysql_compat import split_statements

    stmts = split_statements(
        "USE db;\n-- c1; not a split\nSELECT 'a;b' AS x; \nSELECT 2;"
    )
    assert len(stmts) == 3
    assert stmts[0] == "USE db"
    assert "'a;b'" in stmts[1]


def test_file_translation_tolerates_preamble():
    from sheetsetl_spark.functions.mysql_compat import mysql_file_to_spark_sql

    out = mysql_file_to_spark_sql(
        "USE analytics;\nSET NAMES utf8mb4;\nSELECT 1 AS one;"
    )
    assert out.strip() == "SELECT 1 AS one"


def test_file_translation_rejects_stateful_and_multi():
    from sheetsetl_spark.functions.mysql_compat import (
        UnsupportedMySQLConstruct,
        mysql_file_to_spark_sql,
    )
    import pytest

    with pytest.raises(UnsupportedMySQLConstruct, match="time_zone"):
        mysql_file_to_spark_sql("SET time_zone='+00:00'; SELECT 1")
    with pytest.raises(UnsupportedMySQLConstruct, match="2 result statements"):
        mysql_file_to_spark_sql("SELECT 1; SELECT 2")
    with pytest.raises(UnsupportedMySQLConstruct, match="no SQL statements"):
        mysql_file_to_spark_sql("  -- only a comment\n")


def test_hints_modifiers_and_logical_ops_rewrite():
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    out = mysql_to_spark_sql(
        "SELECT SQL_NO_CACHE STRAIGHT_JOIN a FROM t USE INDEX (i1) "
        "STRAIGHT_JOIN u IGNORE INDEX FOR JOIN (i2) ON t.k = u.k "
        "WHERE a = 1 || b = 2 && c = 'x || y'"
    )
    assert "SQL_NO_CACHE" not in out and "STRAIGHT_JOIN" not in out
    assert "INDEX" not in out
    squeezed = " ".join(out.split())
    assert " OR b" in squeezed and " AND c" in squeezed
    assert "'x || y'" in out  # literals untouched


def test_server_state_functions_reject():
    from sheetsetl_spark.functions.mysql_compat import (
        UnsupportedMySQLConstruct,
        mysql_to_spark_sql,
    )
    import pytest

    for frag, name in [
        ("SELECT DATABASE()", "DATABASE"),
        ("SELECT VERSION()", "VERSION"),
        ("SELECT SLEEP(5)", "SLEEP"),
        ("SELECT LAST_INSERT_ID()", "LAST_INSERT_ID"),
    ]:
        with pytest.raises(UnsupportedMySQLConstruct, match=name):
            mysql_to_spark_sql(frag)
    # ...but a literal mentioning one is fine
    assert "VERSION()" in mysql_to_spark_sql("SELECT 'VERSION() is neat' AS s")


def test_now_family_and_hash_comments_rewrite():
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    out = mysql_to_spark_sql("SELECT CURDATE() AS d, SYSDATE() AS ts # trailing")
    assert "CURRENT_DATE" in out and "CURRENT_TIMESTAMP" in out
    assert "#" not in out and "-- trailing" in out


def test_backslash_escaped_strings_are_masked():
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    s = "SELECT * FROM t WHERE note = 'it\\'s got LIMIT 1, 2 inside'"
    assert mysql_to_spark_sql(s) == s


def test_cte_prefixed_dml_rejects():
    """Spark 4 and MySQL 8 both accept CTE-prefixed DML, so 'WITH t AS
    (SELECT 1) INSERT INTO ...' must reject exactly like bare INSERT in
    BOTH guard entry points (the r5 ADVICE bypass)."""
    import pytest

    from sheetsetl_spark.functions.mysql_compat import (
        UnsupportedMySQLConstruct,
        ensure_read_only,
        mysql_file_to_spark_sql,
    )

    bad = [
        "WITH t AS (SELECT 1) INSERT INTO tgt SELECT * FROM t",
        "WITH t AS (SELECT 1) DELETE FROM tgt WHERE x IN (SELECT * FROM t)",
        "WITH t AS (SELECT 1), u (a, b) AS (SELECT 1, 2) UPDATE tgt SET x=1",
        "with recursive r as (select 1) merge into tgt using r on 1=1"
        " when matched then delete",
        "WITH t AS (SELECT 1) REPLACE INTO tgt SELECT 1",
        # literals/comments can't hide the main body from the scanner
        "WITH t AS (SELECT ')INSERT' AS s) INSERT INTO tgt SELECT 1",
        "/* c */ WITH t AS (SELECT 1) -- x\n INSERT INTO tgt SELECT 1",
        # unparseable CTE list rejects conservatively
        "WITH t AS SELECT 1 INSERT INTO tgt SELECT 1",
    ]
    for q in bad:
        with pytest.raises(UnsupportedMySQLConstruct, match="read-only"):
            ensure_read_only(q)
        with pytest.raises(UnsupportedMySQLConstruct):
            mysql_file_to_spark_sql(q)


def test_cte_prefixed_queries_still_pass():
    from sheetsetl_spark.functions.mysql_compat import (
        ensure_read_only,
        mysql_file_to_spark_sql,
    )

    good = [
        "WITH t AS (SELECT 1) SELECT * FROM t",
        "WITH t AS (SELECT 'INSERT INTO x' AS note) SELECT note FROM t",
        "WITH t (a, b) AS (SELECT 1, 2), u AS (SELECT a FROM t) SELECT * FROM u",
        "WITH RECURSIVE r AS (SELECT 1 AS n) SELECT * FROM r",
        "WITH t AS (SELECT 1) (SELECT * FROM t)",
        "WITH `weird name` AS (SELECT 1) TABLE nation",
        "  -- lead comment\n WITH t AS (SELECT (1+(2)) AS v) VALUES (1)",
    ]
    for q in good:
        ensure_read_only(q)
        mysql_file_to_spark_sql(q)


def test_user_var_constant_chains_translate():
    """r5 verdict item 6: SET @x := const chains (the 5.7-era analyst
    idiom) inline into the query; state-reading forms still reject."""
    import pytest

    from sheetsetl_spark.functions.mysql_compat import (
        UnsupportedMySQLConstruct,
        mysql_file_to_spark_sql,
    )

    out = mysql_file_to_spark_sql(
        "SET @a := 2; SET @b := @a * 10, @c = @b + 1;"
        " SELECT x FROM t WHERE x BETWEEN @a AND @c"
    )
    assert "BETWEEN (2) AND (((2) * 10) + 1)" in " ".join(out.split())
    # literals containing '@' are untouched
    out = mysql_file_to_spark_sql(
        "SET @d := 1; SELECT 'mail@host' AS m FROM t WHERE x = @d"
    )
    assert "'mail@host'" in out and "x = (1)" in out
    with pytest.raises(UnsupportedMySQLConstruct, match="before any constant"):
        mysql_file_to_spark_sql("SET @a := @zzz + 1; SELECT @a AS a")
    with pytest.raises(UnsupportedMySQLConstruct, match="system variable"):
        mysql_file_to_spark_sql("SET @a := @@max_connections; SELECT @a AS a")
    with pytest.raises(UnsupportedMySQLConstruct, match="only constant"):
        mysql_file_to_spark_sql("SET @a := 1, time_zone = '+0:00'; SELECT @a AS a")
    # undefined var in the SELECT still hits the backstop rejection
    with pytest.raises(UnsupportedMySQLConstruct, match="session state"):
        mysql_file_to_spark_sql("SET @a := 1; SELECT @other FROM t")
    # r6 advice: MySQL evaluates SET once; textual inlining would
    # re-evaluate a nondeterministic expression per reference site —
    # reject rather than silently differ
    for fn in ("RAND()", "UUID()", "SYSDATE()", "RAND() * 10"):
        with pytest.raises(UnsupportedMySQLConstruct, match="nondeterministic"):
            mysql_file_to_spark_sql(f"SET @a := {fn}; SELECT @a, @a FROM t")
    # deterministic functions in SET still fold
    out = mysql_file_to_spark_sql("SET @a := ABS(-3); SELECT @a AS a FROM t")
    assert "ABS(-3)" in out


def test_mod_binary_and_insert_fn_rewrites(spark):
    """Infix MOD -> %, unary BINARY stripped (Spark comparisons are
    already binary), CAST(x AS BINARY) preserved, and MySQL INSERT()
    string splice translated with the documented boundary semantics."""
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    assert mysql_to_spark_sql("SELECT 7 MOD 2 AS m") == "SELECT 7 % 2 AS m"
    assert mysql_to_spark_sql("SELECT MOD(7, 2) AS m") == "SELECT MOD(7, 2) AS m"
    # r6 advice: qualified identifiers named 'mod' are NOT the infix op
    assert mysql_to_spark_sql("SELECT t.mod FROM t") == "SELECT t.mod FROM t"
    assert (
        mysql_to_spark_sql("SELECT `mod` FROM t WHERE a MOD b = 0")
        == "SELECT `mod` FROM t WHERE a % b = 0"
    )
    out = mysql_to_spark_sql(
        "SELECT * FROM t WHERE BINARY c = 'O' AND CAST(x AS BINARY) IS NOT NULL"
    )
    assert "BINARY c" not in out and "AS BINARY" in out
    # literals untouched
    s = "SELECT 'a MOD b BINARY INSERT(' AS lit"
    assert mysql_to_spark_sql(s) == s
    # INSERT INTO (DML keyword, no paren) is not the splice function
    assert "INSERT INTO" in mysql_to_spark_sql("SELECT 1 -- INSERT INTO note\n")
    # MySQL-doc truth table, executed on Spark
    for expr, want in [
        ("INSERT('Quadratic', 3, 4, 'What')", "QuWhattic"),
        ("INSERT('Quadratic', -1, 4, 'What')", "Quadratic"),
        ("INSERT('Quadratic', 3, 100, 'What')", "QuWhat"),
        ("INSERT('Quadratic', 10, 1, 'X')", "Quadratic"),
        ("INSERT('abc', 1, 0, 'Z')", "Zabc"),
        ("INSERT(NULL, 1, 1, 'Z')", None),
    ]:
        got = spark.sql(mysql_to_spark_sql(f"SELECT {expr} AS s")).collect()[0]["s"]
        assert got == want, (expr, got, want)


def test_null_strict_greatest_least(spark):
    """MySQL GREATEST/LEAST return NULL when ANY argument is NULL; Spark
    ignores NULLs — the translator must close this silent answer flip."""
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    def val(expr):
        return spark.sql(mysql_to_spark_sql(f"SELECT {expr} AS v")).collect()[0]["v"]

    assert val("GREATEST(1, NULL)") is None
    assert val("LEAST(1, NULL, 0)") is None
    assert val("GREATEST(3, 1, 2)") == 3
    assert val("LEAST(GREATEST(1, NULL), 5)") is None  # nested


def test_date_name_week_and_days_functions(spark):
    """MONTHNAME/DAYNAME full names (Spark's builtins abbreviate),
    TO_DAYS/FROM_DAYS day-number epoch, FORMAT -> FORMAT_NUMBER, and
    WEEK() mode 0 vs a Python reference across year boundaries."""
    from datetime import date, timedelta

    from sheetsetl_spark.functions.mysql_compat import (
        UnsupportedMySQLConstruct,
        mysql_to_spark_sql,
    )

    def val(expr):
        return spark.sql(mysql_to_spark_sql(f"SELECT {expr} AS v")).collect()[0]["v"]

    assert val("MONTHNAME(DATE '1995-03-01')") == "March"
    assert val("DAYNAME(DATE '1995-03-01')") == "Wednesday"
    assert val("TO_DAYS(DATE '2007-10-07')") == 733321  # MySQL doc example
    assert val("FROM_DAYS(733321)") == date(2007, 10, 7)
    assert val("FORMAT(1234567.891, 2)") == "1,234,567.89"

    import pytest

    # non-literal mode still rejects; literal modes 0-7 translate (below)
    with pytest.raises(UnsupportedMySQLConstruct, match="literal mode"):
        mysql_to_spark_sql("SELECT WEEK(d, m) FROM t")
    with pytest.raises(UnsupportedMySQLConstruct, match="literal mode"):
        mysql_to_spark_sql("SELECT WEEK(d, 8) FROM t")

    def mysql_week0(d):
        jan1 = date(d.year, 1, 1)
        first_sunday = jan1 + timedelta(days=(6 - jan1.weekday()) % 7)
        return 0 if d < first_sunday else (d - first_sunday).days // 7 + 1

    import random

    random.seed(7)
    ds = [date(1990, 1, 1) + timedelta(days=random.randrange(0, 15000)) for _ in range(24)]
    ds += [date(y, 1, d) for y in (1995, 2000, 2001) for d in (1, 2, 7, 8)]
    exprs = ", ".join(f"WEEK(DATE '{d}') AS w{i}" for i, d in enumerate(ds))
    row = spark.sql(mysql_to_spark_sql(f"SELECT {exprs}")).collect()[0]
    for i, d in enumerate(ds):
        assert row[f"w{i}"] == mysql_week0(d), str(d)


def test_group_concat_full_grammar(spark):
    """GROUP_CONCAT with ORDER BY (own key, other key, DESC, multi-expr,
    function-call args) — previously the ORDER BY leaked into
    collect_list() (invalid SQL) and paren-bearing arguments never
    matched at all. MySQL NULL ordering (first ASC, last DESC); ties
    break on the value for determinism."""
    import pytest

    from sheetsetl_spark.functions.mysql_compat import (
        UnsupportedMySQLConstruct,
        mysql_to_spark_sql,
    )

    spark.sql(
        "SELECT * FROM VALUES ('a', 3, 1),('b', 1, 1),('c', 2, 1),"
        "(NULL, 9, 1),('a2', NULL, 1) AS t(name, price, k)"
    ).createOrReplaceTempView("gc_t")

    def val(gc):
        q = mysql_to_spark_sql(f"SELECT {gc} AS v FROM gc_t GROUP BY k")
        return spark.sql(q).collect()[0]["v"]

    assert val("GROUP_CONCAT(name)") == "a,a2,b,c"
    assert val("GROUP_CONCAT(UPPER(name))") == "A,A2,B,C"
    assert val("GROUP_CONCAT(name ORDER BY name DESC SEPARATOR '; ')") == "c; b; a2; a"
    assert val("GROUP_CONCAT(name ORDER BY price)") == "a2,b,c,a"  # NULL key first
    assert val("GROUP_CONCAT(name ORDER BY price DESC)") == "a,c,b,a2"
    assert val("GROUP_CONCAT(name, '!' ORDER BY price)") == "a2!,b!,c!,a!"
    assert val("GROUP_CONCAT(DISTINCT name ORDER BY name DESC)") == "c,b,a2,a"
    with pytest.raises(UnsupportedMySQLConstruct, match="ambiguous"):
        mysql_to_spark_sql("SELECT GROUP_CONCAT(DISTINCT name ORDER BY price) FROM t")


def test_strcmp_and_oct_rewrites(spark):
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    def val(expr):
        return spark.sql(mysql_to_spark_sql(f"SELECT {expr} AS v")).collect()[0]["v"]

    assert val("STRCMP('a', 'b')") == -1
    assert val("STRCMP('b', 'a')") == 1
    assert val("STRCMP('a', 'a')") == 0
    assert val("STRCMP('a', NULL)") is None
    assert val("OCT(8)") == "10"
    assert val("OCT(NULL)") is None


def test_set_after_result_statement_rejects():
    """MySQL runs statements sequentially: SET @x after the SELECT can't
    affect it, so folding it would invert the file's semantics."""
    import pytest

    from sheetsetl_spark.functions.mysql_compat import (
        UnsupportedMySQLConstruct,
        mysql_file_to_spark_sql,
    )

    with pytest.raises(UnsupportedMySQLConstruct, match="after the result"):
        mysql_file_to_spark_sql("SELECT 1 AS x; SET @a := 2;")
    # before-the-query placement still translates
    out = mysql_file_to_spark_sql("SET @a := 2; SELECT @a AS x")
    assert "(2)" in out


def test_backtick_identifiers_are_masked():
    """A column named `MOD`/`BINARY`/`limit 1, 2` exists precisely
    because the bare name clashes with a keyword — rewrites must never
    fire inside backtick-quoted identifiers."""
    from sheetsetl_spark.functions.mysql_compat import (
        ensure_read_only,
        mysql_to_spark_sql,
    )

    s = "SELECT `MOD`, `BINARY`, `limit 1, 2`, `WEEK` FROM `orders` WHERE `MOD` > 1"
    assert mysql_to_spark_sql(s) == s
    s2 = "SELECT `a``b` FROM t"  # embedded (doubled) backtick
    assert mysql_to_spark_sql(s2) == s2
    ensure_read_only("WITH `weird name` AS (SELECT 1) SELECT * FROM `weird name`")


def test_stddev_variance_population_semantics(spark):
    """MySQL's bare STDDEV/STD/VARIANCE are POPULATION aggregates;
    Spark's are SAMPLE — a silent numeric flip on every n>1 input. The
    translator rewrites bare forms to _POP; explicit *_SAMP/*_POP
    spellings (identical cross-engine) pass through."""
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    q = mysql_to_spark_sql(
        "SELECT STDDEV(x) AS s, STD(x) AS t, VARIANCE(x) AS v,"
        " STDDEV_SAMP(x) AS ss, VAR_SAMP(x) AS vs"
        " FROM VALUES (1.0),(2.0),(3.0) AS vals(x)"
    )
    assert "STDDEV_POP(" in q and "VAR_POP(" in q and "STDDEV_SAMP(" in q
    r = spark.sql(q).collect()[0]
    assert abs(r["v"] - 2.0 / 3.0) < 1e-12  # population variance
    assert abs(r["s"] - (2.0 / 3.0) ** 0.5) < 1e-12
    assert r["t"] == r["s"]
    assert abs(r["vs"] - 1.0) < 1e-12  # explicit sample form untouched


def test_json_path_operators(spark):
    """MySQL ->> and JSON_UNQUOTE(JSON_EXTRACT(...)) translate exactly
    to GET_JSON_OBJECT; the quoted-JSON forms (-> / bare JSON_EXTRACT)
    reject rather than silently unquoting."""
    import pytest

    from sheetsetl_spark.functions.mysql_compat import (
        UnsupportedMySQLConstruct,
        mysql_to_spark_sql,
    )

    spark.sql("""SELECT '{"k": "v"}' AS doc""").createOrReplaceTempView("json_t")
    q = mysql_to_spark_sql(
        "SELECT doc ->> '$.k' AS k,"
        " JSON_UNQUOTE(JSON_EXTRACT(doc, '$.k')) AS k2 FROM json_t"
    )
    r = spark.sql(q).collect()[0]
    assert (r["k"], r["k2"]) == ("v", "v")
    for bad in (
        "SELECT doc -> '$.k' FROM json_t",
        "SELECT JSON_EXTRACT(doc, '$.k') FROM json_t",
    ):
        with pytest.raises(UnsupportedMySQLConstruct, match="QUOTED JSON"):
            mysql_to_spark_sql(bad)
    # literal containing an arrow is untouched
    s = "SELECT 'a ->> b' AS lit FROM json_t"
    assert mysql_to_spark_sql(s) == s


@pytest.mark.slow  # randomized/corpus sweep - full-suite re-verification
def test_week_all_modes_property(spark):
    """WEEK(d, mode) for every mode 0-7 vs an independent Python port of
    MySQL's calc_week (sql/sql_time.cc) — the SQL renderer uses a
    week-start/anchor decomposition, the reference below transliterates
    the C control flow, so agreement across random + boundary dates is
    two independent derivations meeting."""
    from calendar import isleap
    from datetime import date, timedelta

    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    def calc_week(d, mode):
        # transliteration of MySQL calc_week + week_mode()
        monday_first = bool(mode & 1)
        week_year = bool(mode & 2)
        first_weekday = bool(mode & 4)
        if not monday_first:
            first_weekday = not first_weekday
        year = d.year
        daynr = d.toordinal()
        first_daynr = date(year, 1, 1).toordinal()
        # calc_weekday(first_daynr, sunday_first = not monday_first)
        wd_mon0 = date(year, 1, 1).weekday()
        weekday = (wd_mon0 + 1) % 7 if not monday_first else wd_mon0
        if d.month == 1 and d.day <= 7 - weekday:
            if not week_year and (
                (first_weekday and weekday != 0)
                or (not first_weekday and weekday >= 4)
            ):
                return 0
            week_year = True
            year -= 1
            days = 366 if isleap(year) else 365
            first_daynr -= days
            weekday = (weekday + 53 * 7 - days) % 7
        if (first_weekday and weekday != 0) or (
            not first_weekday and weekday >= 4
        ):
            days = daynr - (first_daynr + (7 - weekday))
        else:
            days = daynr - (first_daynr - weekday)
        if week_year and days >= 52 * 7:
            weekday = (weekday + (366 if isleap(year) else 365)) % 7
            if (not first_weekday and weekday < 4) or (
                first_weekday and weekday == 0
            ):
                return 1
        return days // 7 + 1

    import random

    random.seed(11)
    ds = [
        date(1990, 1, 1) + timedelta(days=random.randrange(0, 15000))
        for _ in range(12)
    ]
    # year-boundary gauntlet: every day Dec 26 - Jan 8 around several years
    for y in (1995, 1999, 2000, 2004, 2016):
        ds += [date(y, 12, 26) + timedelta(days=i) for i in range(14)]
    for mode in range(8):
        exprs = ", ".join(
            f"WEEK(DATE '{d}', {mode}) AS w{i}" for i, d in enumerate(ds)
        )
        row = spark.sql(mysql_to_spark_sql(f"SELECT {exprs}")).collect()[0]
        for i, d in enumerate(ds):
            assert row[f"w{i}"] == calc_week(d, mode), (str(d), mode)
    # WEEK(d) == WEEK(d, 0)
    row = spark.sql(
        mysql_to_spark_sql(
            "SELECT WEEK(DATE '2000-01-02') AS a, WEEK(DATE '2000-01-02', 0) AS b"
        )
    ).collect()[0]
    assert row["a"] == row["b"]


def test_yearweek_all_modes_property(spark):
    """YEARWEEK(d[, mode]) = owning_year*100 + week, with MySQL's forced
    WEEK_YEAR bit (boundary days carry the adjacent year's numbering,
    never week 0) — vs the same Python calc_week port extended to track
    the owning year."""
    from calendar import isleap
    from datetime import date, timedelta

    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    def calc_yearweek(d, mode):
        mode |= 2  # MySQL forces WEEK_YEAR for YEARWEEK
        monday_first = bool(mode & 1)
        first_weekday = bool(mode & 4)
        if not monday_first:
            first_weekday = not first_weekday
        year = d.year
        daynr = d.toordinal()
        first_daynr = date(year, 1, 1).toordinal()
        wd_mon0 = date(year, 1, 1).weekday()
        weekday = (wd_mon0 + 1) % 7 if not monday_first else wd_mon0
        if d.month == 1 and d.day <= 7 - weekday:
            year -= 1
            days = 366 if isleap(year) else 365
            first_daynr -= days
            weekday = (weekday + 53 * 7 - days) % 7
        if (first_weekday and weekday != 0) or (
            not first_weekday and weekday >= 4
        ):
            days = daynr - (first_daynr + (7 - weekday))
        else:
            days = daynr - (first_daynr - weekday)
        if days >= 52 * 7:
            wd_next = (weekday + (366 if isleap(year) else 365)) % 7
            if (not first_weekday and wd_next < 4) or (
                first_weekday and wd_next == 0
            ):
                return (year + 1) * 100 + 1
        return year * 100 + days // 7 + 1

    import random

    random.seed(13)
    ds = [
        date(1990, 1, 1) + timedelta(days=random.randrange(0, 15000))
        for _ in range(8)
    ]
    for y in (1995, 2000, 2016):
        ds += [date(y, 12, 28) + timedelta(days=i) for i in range(10)]
    # MySQL doc example
    assert calc_yearweek(date(1987, 1, 1), 0) == 198652
    for mode in range(8):
        exprs = ", ".join(
            f"YEARWEEK(DATE '{d}', {mode}) AS w{i}" for i, d in enumerate(ds)
        )
        row = spark.sql(mysql_to_spark_sql(f"SELECT {exprs}")).collect()[0]
        for i, d in enumerate(ds):
            assert row[f"w{i}"] == calc_yearweek(d, mode), (str(d), mode)
    row = spark.sql(
        mysql_to_spark_sql("SELECT YEARWEEK(DATE '1987-01-01') AS a")
    ).collect()[0]
    assert row["a"] == 198652


def test_lit_double_array_bit_exact_roundtrip(spark):
    """functions/lits.py: the single-expr SQL literal must reproduce
    every finite double bit-for-bit (repr is shortest-roundtrip and
    Spark's D-suffix literal parses with correctly-rounded
    Double.parseDouble), including signed zero and extreme magnitudes.
    The helpers replace per-element F.lit matrices whose py4j round
    trips cost ~1.8s per DataFrame build for a 32x64 plane matrix."""
    import struct

    from sheetsetl_spark.functions.lits import (
        lit_double_array,
        lit_double_matrix,
    )

    vals = [
        0.0,
        -0.0,
        1.0,
        -1.0,
        3.141592653589793,
        2.2250738585072014e-308,  # smallest normal
        5e-324,  # smallest subnormal
        1.7976931348623157e308,  # largest finite
        -1.2345678901234567e-101,
        0.1,
        1 / 3,
    ]
    got = spark.range(1).select(lit_double_array(vals).alias("x")).first()["x"]
    assert [struct.pack("<d", v) for v in vals] == [
        struct.pack("<d", g) for g in got
    ]
    rows = [vals[:4], vals[4:8]]
    gotm = spark.range(1).select(lit_double_matrix(rows).alias("x")).first()["x"]
    assert [
        [struct.pack("<d", v) for v in row] for row in rows
    ] == [[struct.pack("<d", g) for g in row] for row in gotm]


def test_lit_double_array_nonfinite_fallback(spark):
    """Non-finite values have no SQL literal form — the helper must fall
    back to the per-element path and still produce them."""
    import math

    from sheetsetl_spark.functions.lits import lit_double_array

    got = spark.range(1).select(
        lit_double_array([1.0, float("inf"), float("nan")]).alias("x")
    ).first()["x"]
    assert got[0] == 1.0 and math.isinf(got[1]) and math.isnan(got[2])
