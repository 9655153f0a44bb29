"""Scalar-function library coverage (extension surface — the reference
has no expressions beyond a bare column or literal,
/root/reference/sql-to-json:228-239).

Each query exercises one function family JVM-side with a DuckDB oracle.
Function choices are limited to those with identical cross-engine
semantics (documented per query); engine-specific behaviors (regex
dialect corners, locale collation) are deliberately avoided in oracle
queries and covered by pytest instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query


@query(
    "fn_string_basics",
    oracle="""
    SELECT c_custkey AS ckey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           concat(c_name, ':', c_mktsegment) AS joined,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           trim(concat(' ', c_name, ' ')) AS trimmed,
           reverse(c_mktsegment) AS rev_seg,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded
    FROM customer WHERE c_custkey <= 500
    """,
    tags=("functions", "string"),
)
def fn_string_basics(spark, sf_dir):
    """String functions: upper/lower/length/substr/concat/replace/trim/
    reverse/lpad — all whole-stage-codegen expressions."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        F.col("c_custkey").alias("ckey"),
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("joined"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.reverse(F.col("c_mktsegment")).alias("rev_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
    )


@query(
    "fn_string_regex_split",
    oracle=r"""
    SELECT o_orderkey AS okey,
           regexp_extract(o_orderpriority, '^([0-9]+)-', 1) AS prio_num,
           regexp_replace(o_orderpriority, '[^A-Z]', '', 'g') AS prio_letters,
           split_part(o_orderpriority, '-', 2) AS prio_word,
           contains(o_orderpriority, 'URGENT') AS is_urgent,
           starts_with(o_orderpriority, '1') AS starts_1
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("functions", "string", "regex"),
)
def fn_string_regex_split(spark, sf_dir):
    """Regex extract/replace + split_part/contains/starts_with (simple
    character-class patterns — identical RE2/Java regex semantics)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        F.col("o_orderkey").alias("okey"),
        F.regexp_extract("o_orderpriority", r"^([0-9]+)-", 1).alias("prio_num"),
        F.regexp_replace("o_orderpriority", r"[^A-Z]", "").alias("prio_letters"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).alias("prio_word"),
        F.contains(F.col("o_orderpriority"), F.lit("URGENT")).alias("is_urgent"),
        F.startswith(F.col("o_orderpriority"), F.lit("1")).alias("starts_1"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT p_partkey AS pkey,
           abs(p_retailprice - 910.0) AS abs_diff,
           round(p_retailprice / 7, 2) AS rounded,
           CAST(floor(p_retailprice) AS BIGINT) AS floored,
           CAST(ceil(p_retailprice) AS BIGINT) AS ceiled,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
           round(ln(p_retailprice), 6) AS log_price,
           power(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
           CAST(p_partkey % 7 AS BIGINT) AS mod7,
           greatest(p_size, 25) AS g25,
           least(p_size, 25) AS l25
    FROM part
    """,
    tags=("functions", "math"),
)
def fn_math(spark, sf_dir):
    """Math functions. round() here divides a 2-decimal double by 7 —
    both engines do IEEE double division then round-half-away — and
    abs/floor/ceil/sqrt/power are correctly-rounded IEEE ops, so those
    match bit-for-bit. ln is libm-dependent (differs in the last ulp
    between JVM and DuckDB), so it is rounded to 6 decimals."""
    p = t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("pkey"),
        F.abs(F.col("p_retailprice") - 910.0).alias("abs_diff"),
        F.round(F.col("p_retailprice") / 7, 2).alias("rounded"),
        F.floor("p_retailprice").alias("floored"),
        F.ceil("p_retailprice").alias("ceiled"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("log_price"),
        F.pow(F.col("p_size").cast("double"), 2.0).alias("size_sq"),
        (F.col("p_partkey") % 7).alias("mod7"),
        F.greatest(F.col("p_size"), F.lit(25)).alias("g25"),
        F.least(F.col("p_size"), F.lit(25)).alias("l25"),
    )


@query(
    "fn_date_parts",
    oracle="""
    SELECT o_orderkey AS okey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow1,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("functions", "date"),
)
def fn_date_parts(spark, sf_dir):
    """Date-part extraction + formatting + day arithmetic.
    DuckDB dayofweek is 0=Sunday, Spark dayofweek is 1=Sunday — the
    oracle adds 1 to line them up."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        F.col("o_orderkey").alias("okey"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow1"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("bigint")
        .alias("days_since"),
    )


@query(
    "fn_date_trunc_add",
    oracle="""
    SELECT o_orderkey AS okey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("functions", "date"),
)
def fn_date_trunc_add(spark, sf_dir):
    """date_trunc / interval add / last_day, emitted as strings so the
    engines' different date/timestamp carriers can't skew the compare."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        F.col("o_orderkey").alias("okey"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("plus_30d"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey AS okey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS bucket,
           CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open'
                ELSE 'other' END AS status_word,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_nn,
           if(o_totalprice > 200000, 1, 0) AS is_big
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("functions", "conditional"),
)
def fn_conditional(spark, sf_dir):
    """CASE / simple CASE / NULLIF+COALESCE / IF."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        F.col("o_orderkey").alias("okey"),
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_nn"
        ),
        F.when(F.col("o_totalprice") > 200000, 1).otherwise(0).alias("is_big"),
    )


@query(
    "fn_array_ops",
    oracle=r"""
    WITH a AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           len(toks) AS n_toks,
           len(list_distinct(toks)) AS n_distinct,
           array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS first5_sorted,
           list_contains(toks, 'spark') AS has_spark,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS INTEGER) AS n_long,
           list_sort(list_transform(list_distinct(toks), x -> length(x)))[1] AS min_len
    FROM a
    """,
    tags=("functions", "array"),
)
def fn_array_ops(spark, sf_dir):
    """Array/higher-order functions: size, distinct, sort+slice+join,
    contains, lambda filter, lambda transform."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    a = d.select("doc_id", toks.alias("toks"))
    return a.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct("toks")), 1, 5), ","
        ).alias("first5_sorted"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).alias("n_long"),
        F.element_at(
            F.array_sort(F.transform(F.array_distinct("toks"), F.length)), 1
        ).alias("min_len"),
    )


@query(
    "fn_map_struct",
    oracle="""
    SELECT n_nationkey AS nkey,
           {'name': n_name, 'region': n_regionkey}.name AS s_name,
           map_extract(map {'k': n_name}, 'k')[1] AS m_val,
           struct_pack(a := n_nationkey, b := n_regionkey).b AS s_b
    FROM nation
    """,
    tags=("functions", "map", "struct"),
)
def fn_map_struct(spark, sf_dir):
    """Struct construction + field access, map construction + lookup."""
    n = t(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").alias("nkey"),
        F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
        .getField("name")
        .alias("s_name"),
        F.element_at(F.create_map(F.lit("k"), F.col("n_name")), "k").alias("m_val"),
        F.struct(F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("b"))
        .getField("b")
        .alias("s_b"),
    )


@query(
    "fn_hash_encode",
    oracle="""
    SELECT n_nationkey AS nkey,
           md5(n_name) AS h_md5,
           to_base64(encode(n_name)) AS b64,
           to_hex(encode(n_name)) AS hexed
    FROM nation
    """,
    tags=("functions", "hash"),
)
def fn_hash_encode(spark, sf_dir):
    """Hash/encoding functions portable across engines (md5, base64,
    hex). DuckDB hex(blob) is uppercase; Spark hex(binary) is uppercase
    too — to_hex in DuckDB matches Spark's hex."""
    n = t(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").alias("nkey"),
        F.md5(F.col("n_name").cast("binary")).alias("h_md5"),
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.hex(F.col("n_name").cast("binary")).alias("hexed"),
    )


@query(
    "fn_pandas_udf_vectorized",
    oracle=r"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS py_tokens,
           length(text) % 101 AS py_bucket
    FROM documents
    """,
    tags=("functions", "pandas-udf"),
)
def fn_pandas_udf_vectorized(spark, sf_dir):
    """Scalar @pandas_udf (Arrow-vectorized Series→Series): the
    sanctioned slow path when built-ins can't express the logic.
    Deterministic string ops so DuckDB can oracle it; the plan shows an
    ArrowEvalPython node batching whole columns, never per-row Python."""
    from minoan_athenaeum_spark.operators.py_udfs import (
        py_len_bucket,
        py_token_count,
    )

    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        py_token_count(F.col("text")).alias("py_tokens"),
        py_len_bucket(F.col("text")).alias("py_bucket"),
    )


@query(
    "fn_python_udtf",
    oracle=r"""
    WITH words AS (
      SELECT doc_id,
             UNNEST(list_distinct(
               regexp_split_to_array(lower(trim(text)), '\s+'))) AS word
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, word, CAST(length(word) AS INTEGER) AS wlen
    FROM words WHERE word <> ''
    """,
    tags=("functions", "udtf"),
)
def fn_python_udtf(spark, sf_dir):
    """Python USER-DEFINED TABLE FUNCTION (Spark 4 ``@udtf``): a
    row-to-many-rows generator usable in a lateral position — the
    extension point for tokenizers/parsers that genuinely need Python
    yet must produce table-shaped output. The UDTF emits each doc's
    distinct words with lengths; the oracle replays it with SQL list
    functions. Registered ARROW-OPTIMIZED (``useArrow=True``): rows
    batch through the same Arrow channel as pandas UDFs instead of
    pickled row-at-a-time — the r11 plan shows ArrowEvalPythonUDTF,
    keeping the repo's no-row-at-a-time-Python invariant intact even
    here."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, wlen: int", useArrow=True)
    class DistinctWords:
        def eval(self, text: str):
            if text is None:
                return
            seen = set()
            for w in text.lower().strip().split():
                if w and w not in seen:
                    seen.add(w)
                    yield w, len(w)

    spark.udtf.register("mas_distinct_words", DistinctWords)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("mas_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, w.word, w.wlen
        FROM mas_udtf_docs d,
             LATERAL mas_distinct_words(d.text) w
        """
    )
