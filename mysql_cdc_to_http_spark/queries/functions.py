"""Scalar function library: string / datetime / math / array / map-JSON
(SURVEY.md §2.3 X23-X27).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; zero Python in the hot path. Oracle SQL compensates
for DuckDB dialect differences (return types of length/floor/rank,
``dayofweek`` origin, ``log`` base) so values align bit-for-bit where the
math is exact and to a fixed rounding where it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.queries.registry import query


# --------------------------------------------------------------------------
# X23 — string functions
# --------------------------------------------------------------------------
@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                              AS brand_upper,
           lower(p_type)                               AS type_lower,
           substring(p_name, 1, 10)                    AS name_prefix,
           CAST(length(p_name) AS INT)                 AS name_len,
           concat_ws('|', p_brand, p_type)             AS brand_type,
           trim(p_name)                                AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0')       AS size_pad,
           regexp_extract(p_name, '([a-z]+)', 1)       AS first_word,
           regexp_replace(p_name, ' ', '_')            AS name_snake,
           string_split(p_name, ' ')[1]                AS word0
    FROM part
    ORDER BY p_partkey
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.split("p_name", " ").getItem(0).alias("word0"),
    )


# --------------------------------------------------------------------------
# string functions, second batch: similarity + editing
# --------------------------------------------------------------------------
@query(
    "q_fn_string2",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_type) AS INT)  AS lev_name_type,
           reverse(p_brand)                          AS brand_rev,
           repeat(p_brand, 2)                        AS brand_x2,
           translate(p_name, 'aeiou', '#####')       AS name_novowel,
           CAST(strpos(p_name, ' ') AS INT)          AS space_pos,
           left(p_name, 3)                           AS name_l3,
           right(p_name, 3)                          AS name_r3
    FROM part ORDER BY p_partkey
    """,
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("lev_name_type"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_x2"),
        F.translate("p_name", "aeiou", "#####").alias("name_novowel"),
        F.instr("p_name", " ").alias("space_pos"),
        F.substring("p_name", 1, 3).alias("name_l3"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("name_r3"),
    )


# --------------------------------------------------------------------------
# conditional + bitwise expressions
# --------------------------------------------------------------------------
@query(
    "q_fn_misc",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')   AS status_or_open,
           if(o_totalprice > 250000, 'big', 'small')      AS size_class,
           greatest(o_totalprice, 100000.0)               AS at_least_100k,
           least(CAST(o_orderkey % 7 AS BIGINT),
                 CAST(o_orderkey % 5 AS BIGINT))          AS min_mod,
           o_orderkey & 255                               AS key_and,
           o_orderkey | 4096                              AS key_or,
           xor(o_orderkey, 12345)                         AS key_xor,
           o_orderkey << 2                                AS key_shl,
           o_orderkey >> 3                                AS key_shr
    FROM orders ORDER BY o_orderkey
    """,
)
def q_fn_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_totalprice") > 250000, "big").otherwise("small").alias(
            "size_class"
        ),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("at_least_100k"),
        F.least(k % 7, k % 5).alias("min_mod"),
        k.bitwiseAND(F.lit(255)).alias("key_and"),
        k.bitwiseOR(F.lit(4096)).alias("key_or"),
        k.bitwiseXOR(F.lit(12345)).alias("key_xor"),
        F.shiftleft(k, 2).alias("key_shl"),
        F.shiftright(k, 3).alias("key_shr"),
    )


# --------------------------------------------------------------------------
# X24 — date/time functions
# --------------------------------------------------------------------------
@query(
    "q_fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                      AS yr,
           CAST(month(o_orderdate) AS INT)                     AS mo,
           CAST(dayofweek(o_orderdate) + 1 AS INT)             AS dow,
           o_orderdate + INTERVAL 30 DAY                       AS due_ts,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(epoch(o_orderdate) AS BIGINT)                  AS epoch_s,
           CAST(o_orderdate AS DATE)                           AS order_date
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.expr("o_orderdate + INTERVAL 30 DAYS").alias("due_ts"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.to_date("o_orderdate").alias("order_date"),
    )


# --------------------------------------------------------------------------
# date/time functions, second batch: calendar arithmetic
# --------------------------------------------------------------------------
@query(
    "q_fn_datetime2",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INT)          AS qtr,
           CAST(dayofyear(o_orderdate) AS INT)        AS doy,
           CAST(weekofyear(o_orderdate) AS INT)       AS woy,
           last_day(o_orderdate)                      AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
           CAST(o_orderdate - INTERVAL 90 DAY AS DATE)  AS minus90d
    FROM orders ORDER BY o_orderkey
    """,
)
def q_fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).alias("plus3mo"),
        F.date_sub(F.to_date("o_orderdate"), 90).alias("minus90d"),
    )


# --------------------------------------------------------------------------
# X25 — math functions
# --------------------------------------------------------------------------
@query(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2)                       AS price_r2,
           CAST(floor(l_discount * 100) AS BIGINT)         AS disc_pct_floor,
           CAST(ceil(l_tax * 100) AS BIGINT)               AS tax_pct_ceil,
           abs(l_quantity - 25.0)                          AS qty_dev,
           round(pow(l_quantity, 2), 4)                    AS qty_sq,
           round(sqrt(l_extendedprice), 4)                 AS price_sqrt,
           round(ln(l_extendedprice + 1.0), 6)             AS price_ln,
           CAST(((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS BIGINT) AS key_pmod,
           CAST(sign(l_quantity - 25.0) AS DOUBLE)         AS qty_sign
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at the value's own decimal width (identity) — one digit
        # fewer would sit on the .x5 boundary where engines disagree.
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct_floor"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_pmod"),
        F.signum(F.col("l_quantity") - 25.0).alias("qty_sign"),
    )


# --------------------------------------------------------------------------
# X26 — array functions incl. higher-order (on embeddings.embedding)
# --------------------------------------------------------------------------
@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)                              AS dim,
           round(list_sum(CAST(embedding AS DOUBLE[])), 4)          AS vec_sum,
           list_min(embedding)                                      AS vec_min,
           list_max(embedding)                                      AS vec_max,
           round(list_sum(CAST(embedding[1:3] AS DOUBLE[])), 4)     AS first3_sum,
           CAST(len(list_filter(embedding, x -> x > 1.0)) AS INT)   AS n_gt1,
           list_sort(embedding)[1]                                  AS sorted_head
    FROM embeddings
    ORDER BY vec_id
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array-typed OUTPUT columns crash the driver's canonicalizer
    # (unhashable in its pandas sort) — slice is still exercised, but the
    # surfaced column is a scalar fold of the slice.
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    first3 = F.transform(F.slice("embedding", 1, 3), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.array_min("embedding").alias("vec_min"),
        F.array_max("embedding").alias("vec_max"),
        F.round(
            F.aggregate(first3, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("first3_sum"),
        F.size(F.filter("embedding", lambda x: x > 1.0)).alias("n_gt1"),
        F.element_at(F.sort_array("embedding"), 1).alias("sorted_head"),
    )


# --------------------------------------------------------------------------
# array functions, second batch: construction + positional ops
# --------------------------------------------------------------------------
@query(
    "q_fn_array2",
    oracle="""
    SELECT vec_id,
           CAST(list_position(embedding, list_max(embedding)) AS INT)
             AS argmax_pos,
           to_json([CAST(vec_id AS BIGINT), CAST(label AS BIGINT)])
             AS id_label_json,
           round(list_sum(CAST(flatten([embedding[1:2], embedding[3:4]])
                               AS DOUBLE[])), 4) AS first4_sum,
           to_json(range(0, CAST(label AS BIGINT) + 1)) AS label_seq_json,
           round(list_sum(CAST(embedding[1:2] || embedding[63:64]
                               AS DOUBLE[])), 4) AS ends_sum
    FROM embeddings ORDER BY vec_id
    """,
)
def q_fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Construction / positional array ops, surfaced as scalars (JSON text
    # for integer arrays, rounded fold for float slices) — array-typed
    # output columns crash the driver's canonicalizer.
    emb = load_table(spark, sf_dir, "embeddings")

    def dsum(arr, alias):
        as_double = F.transform(arr, lambda x: x.cast("double"))
        return F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias(alias)

    return emb.select(
        "vec_id",
        F.array_position("embedding", F.array_max("embedding")).cast("int").alias(
            "argmax_pos"
        ),
        F.to_json(
            F.array(F.col("vec_id").cast("long"), F.col("label").cast("long"))
        ).alias("id_label_json"),
        dsum(
            F.flatten(
                F.array(F.slice("embedding", 1, 2), F.slice("embedding", 3, 2))
            ),
            "first4_sum",
        ),
        F.to_json(
            F.sequence(F.lit(0).cast("long"), F.col("label").cast("long"))
        ).alias("label_seq_json"),
        dsum(
            F.concat(F.slice("embedding", 1, 2), F.slice("embedding", 63, 2)),
            "ends_sum",
        ),
    )


# --------------------------------------------------------------------------
# X27 — map / JSON functions (on events.props)
# --------------------------------------------------------------------------
@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                 AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(len(json_keys(props)) AS INT)                AS n_keys
    FROM events
    ORDER BY event_id
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Key list surfaced as a sorted CSV string (array outputs crash the
    # driver canonicalizer; sorting removes document-order dependence).
    events = load_table(spark, sf_dir, "events")
    props_map = F.from_json("props", "map<string,bigint>")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_long"),
        F.array_join(F.array_sort(F.map_keys(props_map)), ",").alias("keys_csv"),
        F.size(F.map_keys(props_map)).alias("n_keys"),
    )


# --------------------------------------------------------------------------
# X150 — VARIANT semi-structured type (Spark 4): parse_json into the
# binary variant encoding, typed variant_get extraction, aggregation on
# the extracted values. The modern schema-on-read path — the engine's
# from_json/get_json_object surface (X27) predates it.
# --------------------------------------------------------------------------
@query(
    "q_variant",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events props JSON into Spark 4's VARIANT type and
    aggregate a typed extraction.

    VARIANT is the engine-native semi-structured path: parse once into
    the binary variant encoding at the scan, then ``variant_get`` with
    a type — no per-query string re-parsing, no schema declaration
    (the reference's rows are schemaless maps, main.go:126; VARIANT is
    the Spark-4 answer to exactly that shape). Extraction stays inside
    whole-stage codegen; the VARIANT column itself never reaches the
    output (driver-safe). Integer payloads make the aggregate exact;
    the DuckDB oracle reads the same JSON with ->> extraction."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.max(k).cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# X151 — nested array-of-structs processing: orders carrying their line
# items as a nested array, with per-order measures computed INSIDE the
# array by HOFs (no re-explode). The denormalized document-shape
# surface (§1.2 notes the reference has no nested types; Spark does,
# and a training-data lakehouse uses them constantly).
# --------------------------------------------------------------------------
@query(
    "q_nested_orders",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             count(*) AS n_items,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS revenue
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST((1000000 * sum(n_items)) // count(*) AS BIGINT)
             AS avg_items_micro,
           CAST(sum(revenue) AS DOUBLE) AS total_revenue
    FROM per_order JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_nested_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the nested order document (order → array of line-item
    structs), compute per-order measures with array HOFs, roll up by
    priority.

    The point under test is the NESTED path: after ``collect_list
    (struct(...))``, item count is ``size(items)`` and revenue is an
    ``F.aggregate`` fold over the struct array — no second explode,
    no re-shuffle; once documents are denormalized this is how every
    per-document measure runs. Determinism: the fold accumulates in
    DECIMAL, so the (collection-order-dependent!) array order cannot
    change the sum — the same reason collect_list output is otherwise
    banned from oracle outputs. The oracle computes identical measures
    from the FLAT relation, certifying the nested compute against the
    relational definition. avg items is an integer micro-floor."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.struct(
            F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
            F.col("l_discount").cast("decimal(4,2)").alias("disc"),
        ).alias("item"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list("item").alias("items")
    )
    revenue = F.aggregate(
        F.col("items"),
        F.lit("0").cast("decimal(28,4)"),
        lambda acc, x: (
            acc + (x["price"] * (F.lit(1) - x["disc"])).cast("decimal(28,4)")
        ).cast("decimal(28,4)"),
    )
    per_order = nested.select(
        "l_orderkey",
        F.size("items").alias("n_items"),
        revenue.alias("revenue"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return (
        per_order.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("(1000000 * sum(n_items)) div count(*)")
            .cast("bigint")
            .alias("avg_items_micro"),
            F.sum("revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# X163 — try_* fail-soft arithmetic/access (Spark 3.5/4 ANSI
# companions): NULL instead of error on division-by-zero, overflow,
# malformed casts, out-of-bounds access. The engine-native version of
# the reference's fail-soft coercion philosophy (main.go:150-153) for
# the ANSI-on world.
# --------------------------------------------------------------------------
@query(
    "q_fn_try",
    oracle="""
    SELECT event_id,
           CASE WHEN CAST(event_id % 5 AS BIGINT) = 0 THEN NULL
                ELSE value / (event_id % 5) END AS div_soft,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE CAST(9223372036854775807 AS BIGINT) END AS add_soft,
           try_cast(CASE WHEN event_id % 2 = 0
                         THEN CAST(value AS VARCHAR)
                         ELSE 'not-a-number' END AS DOUBLE) AS num_soft,
           CASE WHEN event_id % 4 < 2
                THEN string_split(event_type, '')[CAST(event_id % 4 AS INT) + 1]
                END AS elem_soft
    FROM events ORDER BY event_id
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fail-soft scalar surface under ANSI mode: ``try_divide`` (NULL
    on /0), ``try_add`` (NULL on bigint overflow), ``try_to_number``-
    style parse via try_cast (NULL on malformed), ``try_element_at``
    (NULL out of bounds). The registry pins ANSI OFF for result parity,
    but these functions are what an ANSI-ON deployment uses to keep
    the reference's fail-soft semantics — same contract, explicit
    per-expression. The oracle states each NULL condition as a CASE,
    certifying the semantics rather than calling same-named functions."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("try_divide(value, event_id % 5)").alias("div_soft"),
        F.expr(
            "CASE WHEN event_id % 3 = 0"
            " THEN try_add(CAST(9223372036854775807 AS BIGINT),"
            "              CAST(1 AS BIGINT))"
            " ELSE CAST(9223372036854775807 AS BIGINT) END"
        ).alias("add_soft"),
        F.expr(
            "try_cast(CASE WHEN event_id % 2 = 0"
            " THEN CAST(value AS STRING) ELSE 'not-a-number' END"
            " AS DOUBLE)"
        ).alias("num_soft"),
        F.expr(
            "try_element_at(split(event_type, ''),"
            " CASE WHEN event_id % 4 < 2 THEN CAST(event_id % 4 AS INT) + 1"
            " ELSE 99 END)"
        ).alias("elem_soft"),
    )


# --------------------------------------------------------------------------
# X164 — MAP-type surface: construction, lookup, map_filter /
# transform_values / map_concat HOFs. Maps are the engine's envelope
# currency (the reference's rows are string-keyed maps, main.go:126);
# outputs are extracted SCALARS because map columns are driver-unsafe.
# --------------------------------------------------------------------------
@query(
    "q_fn_map",
    oracle="""
    SELECT o_orderkey,
           o_totalprice * 2          AS doubled_price,
           CAST(o_orderkey % 7 AS BIGINT) AS mod7,
           CASE WHEN o_totalprice > 100000 THEN 2 ELSE 1 END AS n_kept,
           concat('s=', o_orderstatus, ',p=', o_orderpriority) AS packed,
           3 AS n_merged
    FROM orders ORDER BY o_orderkey
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map per order, transform and filter it with MAP HOFs,
    then extract scalar results: transform_values doubles the price
    entry, map_filter keeps entries above a threshold (count kept),
    map_concat merges a second map, element_at looks entries back up.
    The oracle computes the same SCALARS directly — certifying the
    map pipeline's observable results (maps themselves can't cross
    the driver-hash boundary). All HOFs are JVM codegen; at 100 TB
    this is projection-speed like every scalar family."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.create_map(
            F.lit("price"), F.col("o_totalprice"),
            F.lit("mod7"), (F.col("o_orderkey") % 7).cast("double"),
        ).alias("m"),
    )
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    kept = F.map_filter(
        F.col("m"), lambda k, v: (k == F.lit("mod7")) | (v > 100000)
    )
    merged = F.map_concat(
        F.col("m"),
        F.create_map(F.lit("status"), F.lit(1.0)),
    )
    return base.select(
        "o_orderkey",
        F.element_at(doubled, "price").alias("doubled_price"),
        F.element_at(F.col("m"), "mod7").cast("bigint").alias("mod7"),
        F.size(kept).alias("n_kept"),
        F.concat(
            F.lit("s="),
            F.col("o_orderstatus"),
            F.lit(",p="),
            F.col("o_orderpriority"),
        ).alias("packed"),
        F.size(merged).alias("n_merged"),
    )


# --------------------------------------------------------------------------
# X165 — STRUCT surface: construction, field access, lexicographic
# struct comparison (the min_by/max_by tie-break workhorse used across
# the engine, exercised here explicitly), and struct-typed argmin.
# --------------------------------------------------------------------------
@query(
    "q_fn_struct",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey) AS rn_a,
             row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_d
      FROM orders
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           max(CASE WHEN rn_a = 1 THEN o_orderkey END) AS cheapest_order,
           max(CASE WHEN rn_d = 1 THEN o_orderkey END) AS priciest_order,
           max(CASE WHEN rn_a = 1 THEN o_totalprice END) AS min_price
    FROM r GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-ordered aggregation per customer: the order id at the
    (price, id)-lexicographic minimum and maximum, plus the minimum
    price recovered from a struct min's field access.

    Structs compare lexicographically field-by-field in both engines,
    which is why (value, tiebreak) structs are the engine's standard
    deterministic-argmin device (q_ohlc_bars, session patterns, asof);
    this query pins that contract directly — min_by/max_by over a
    struct ordering key is ambiguous-free even under price ties.
    One two-phase hash agg; struct construction is codegen. (DuckDB's
    min_by rejects struct ordering keys, so the oracle states the same
    lexicographic semantics via row_number windows — semantics
    certified, not function names, the q_fn_try rule.)"""
    o = load_table(spark, sf_dir, "orders")
    key = F.struct(
        F.col("o_totalprice").alias("o_totalprice"),
        F.col("o_orderkey").alias("o_orderkey"),
    )
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min_by("o_orderkey", key).alias("cheapest_order"),
            F.max_by("o_orderkey", key).alias("priciest_order"),
            F.min(key).getField("o_totalprice").alias("min_price"),
        )
        
    )
