package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.sources.Tables._
import graft.sources.Num._

/** Scalar-function battery (SURVEY.md §2.10 + §2.12): string, date,
  * JSON, array/higher-order, math, conditional, null-handling. All are
  * codegen'd Catalyst built-ins — no UDFs in any hot path.
  */
object Functions {
  type Q = (SparkSession, String) => DataFrame

  /** String functions: regexp_extract, split, upper, length,
    * format_string, concat_ws (parity: §2.10 printf-style `%015d`).
    */
  val f1String: Q = (s, d) =>
    part(s, d)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        upper(element_at(split(col("p_name"), " "), -1)).as("last_word_up"),
        length(col("p_name")).as("name_len"),
        format_string("%015d", col("p_partkey")).as("padded_key"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))

  /** Date functions: date_format, unix_timestamp, datediff-style month
    * bucketing (parity: §2.10 `%Y%m%d%H%M%S` dump-id format).
    */
  val f2Date: Q = (s, d) =>
    orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(unix_timestamp(col("o_orderdate"))).as("min_epoch"),
        max(date_format(col("o_orderdate"), "yyyyMMddHHmmss")).as("max_dump_id"))

  /** JSON extraction from events.props (Spark: get_json_object). */
  val f3Json: Q = (s, d) =>
    events(s, d)
      .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"),
              col("value"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))

  /** Array / higher-order functions over embeddings: size, transform,
    * aggregate (fold), array_max — the zip_with/aggregate dot-product
    * idiom that similarity search builds on.
    */
  val f4Array: Q = (s, d) =>
    embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(sqrt(aggregate(transform(col("embedding"), e => e.cast(DoubleType) * e.cast(DoubleType)),
                             lit(0.0), (acc, x) => acc + x)), 3).as("l2_norm"),
        round(array_max(col("embedding")).cast(DoubleType), 4).as("max_elem"))

  /** Math: ceil/floor/greatest/least/abs (IEEE-exact only — no libm). */
  val f5Math: Q = (s, d) =>
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        ceil(col("l_quantity") / 7).cast(LongType).as("qty_bucket"),
        round(greatest(col("l_discount"), col("l_tax")), 2).as("max_rate"),
        round(least(col("l_discount"), col("l_tax")), 2).as("min_rate"),
        abs(col("l_quantity") - lit(25.0)).as("qty_dev"))
      .filter(col("l_orderkey") % 50 === 0)

  /** Hashing + encode: md5 over utf-8 text (parity: §2.10 encode). */
  val f6Hash: Q = (s, d) =>
    documents(s, d)
      .groupBy(substring(md5(col("text")), 1, 1).as("md5_prefix"))
      .agg(count(lit(1)).as("n_docs"),
           sum(octet_length(col("text"))).as("total_bytes"))

  /** CASE WHEN tiering. */
  val f7Case: Q = (s, d) =>
    orders(s, d)
      .groupBy(
        when(col("o_totalprice") > 150000, "high")
          .when(col("o_totalprice") > 50000, "mid")
          .otherwise("low").as("tier"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))

  /** Null handling: nullif / coalesce / null-aware counts. */
  val f8Null: Q = (s, d) =>
    lineitem(s, d)
      .select(nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
              col("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("disc_or_null")).as("n_discounted"),
           moneySum(coalesce(col("disc_or_null"), lit(0.0))).as("sum_disc"))

  /** Bitwise family: and/or/xor/shift/popcount on the key column
    * (NB the DuckDB oracle spells xor as xor() — its ^ is POWER).
    */
  val f9Bitwise: Q = (s, d) =>
    orders(s, d)
      .filter(col("o_orderkey") % 101 === 0)
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("k_and"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("k_or"),
        col("o_orderkey").bitwiseXOR(lit(1023L)).as("k_xor"),
        shiftleft(col("o_orderkey"), 3).as("k_shl"),
        shiftright(col("o_orderkey"), 2).as("k_shr"),
        bit_count(col("o_orderkey")).cast(LongType).as("k_bits"))

  /** Extended string family: replace / translate / lpad / rpad /
    * repeat / reverse / left / right — identical spellings in DuckDB.
    */
  val f10String2: Q = (s, d) =>
    part(s, d)
      .filter(col("p_partkey") % 73 === 0)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "a", "@").as("subbed"),
        translate(col("p_brand"), "Brand#", "brnd-0").as("xlated"),
        lpad(col("p_type"), 12, ".").as("padded_l"),
        rpad(col("p_type"), 12, ".").as("padded_r"),
        repeat(substring(col("p_name"), 1, 2), 3).as("tripled"),
        reverse(col("p_name")).as("reversed"))

  /** try_/safe variants: division by zero and bad casts yield NULL
    * instead of failing the job — at 100 TB one malformed row must
    * not kill a 6-hour pipeline run.
    */
  val f11Try: Q = (s, d) =>
    lineitem(s, d)
      .filter(col("l_orderkey") % 97 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(try_divide(col("l_extendedprice").cast(DoubleType),
                         col("l_discount")), 4).as("price_per_disc"),
        try_divide(col("l_quantity"), lit(0.0)).as("div_zero"),
        expr("try_cast(l_returnflag AS INT)").as("bad_cast"),
        expr("try_cast(l_linenumber AS STRING)").as("ok_cast"))

  /** Higher-order array functions beyond transform/aggregate (f4):
    * exists / forall / filter+size / reduce with a finish lambda —
    * the lambda-capable surface the array column type needs. Integer
    * outputs only (the per-element sums are exact).
    */
  val f12Hof: Q = (s, d) =>
    documents(s, d)
      .withColumn("ws", expr("split(trim(text), '\\\\s+')"))
      .select(
        col("doc_id"),
        expr("exists(ws, t -> length(t) > 8)").as("has_long_token"),
        expr("forall(ws, t -> length(t) > 1)").as("all_multichar"),
        expr("size(filter(ws, t -> length(t) = 4))").as("n_len4"),
        expr("""reduce(ws, 0, (acc, t) -> acc + length(t),
                       acc -> acc * 2)""").as("twice_char_sum"))
      .filter(col("doc_id") < 40)

  val queries: Map[String, Q] = Map(
    "f1_string" -> f1String,
    "f2_date" -> f2Date,
    "f3_json" -> f3Json,
    "f4_array" -> f4Array,
    "f5_math" -> f5Math,
    "f6_hash" -> f6Hash,
    "f7_case" -> f7Case,
    "f8_null" -> f8Null,
    "f9_bitwise" -> f9Bitwise,
    "f10_string2" -> f10String2,
    "f11_try" -> f11Try,
    "f12_hof" -> f12Hof,
  )

  val oracles: Map[String, String] = Map(
    "f12_hof" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents WHERE doc_id < 40)
        |SELECT doc_id,
        |  length(list_filter(ws, t -> length(t) > 8)) > 0 AS has_long_token,
        |  length(list_filter(ws, t -> length(t) <= 1)) = 0 AS all_multichar,
        |  CAST(length(list_filter(ws, t -> length(t) = 4)) AS INT) AS n_len4,
        |  CAST(2 * list_sum(list_transform(ws, t -> length(t))) AS INT)
        |    AS twice_char_sum
        |FROM t""".stripMargin,
    "f1_string" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        | upper(split_part(p_name, ' ', -1)) AS last_word_up,
        | length(p_name) AS name_len,
        | printf('%015d', p_partkey) AS padded_key,
        | concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part""".stripMargin,
    "f2_date" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        | count(1) AS n_orders,
        | min(CAST(epoch(o_orderdate) AS BIGINT)) AS min_epoch,
        | max(strftime(o_orderdate, '%Y%m%d%H%M%S')) AS max_dump_id
        |FROM orders GROUP BY 1""".stripMargin,
    "f3_json" ->
      s"""SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS k_mod,
         | count(1) AS n, ${sqlMoneySum("value")} AS sum_value
         |FROM events GROUP BY 1""".stripMargin,
    "f4_array" ->
      """SELECT vec_id, length(embedding) AS dim,
        | round(sqrt(list_sum(list_transform(embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))), 3) AS l2_norm,
        | round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_elem
        |FROM embeddings""".stripMargin,
    "f5_math" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket,
        | round(greatest(l_discount, l_tax), 2) AS max_rate,
        | round(least(l_discount, l_tax), 2) AS min_rate,
        | abs(l_quantity - 25.0) AS qty_dev
        |FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin,
    "f6_hash" ->
      """SELECT substring(md5(text), 1, 1) AS md5_prefix,
        | count(1) AS n_docs, CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1""".stripMargin,
    "f7_case" ->
      s"""SELECT CASE WHEN o_totalprice > 150000 THEN 'high'
         |            WHEN o_totalprice > 50000 THEN 'mid'
         |            ELSE 'low' END AS tier,
         | count(1) AS n, ${sqlMoneySum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1""".stripMargin,
    "f8_null" ->
      s"""SELECT l_returnflag, count(1) AS n_rows,
         | count(nullif(l_discount, 0.0)) AS n_discounted,
         | ${sqlMoneySum("coalesce(nullif(l_discount, 0.0), 0.0)")} AS sum_disc
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "f9_bitwise" ->
      """SELECT o_orderkey,
        | o_orderkey & 255 AS k_and,
        | o_orderkey | 4096 AS k_or,
        | xor(o_orderkey, 1023) AS k_xor,
        | o_orderkey << 3 AS k_shl,
        | o_orderkey >> 2 AS k_shr,
        | CAST(bit_count(o_orderkey) AS BIGINT) AS k_bits
        |FROM orders WHERE o_orderkey % 101 = 0""".stripMargin,
    // DuckDB regexp_replace is first-match by default — 'g' matches
    // Spark's replace-all
    "f10_string2" ->
      """SELECT p_partkey,
        | regexp_replace(p_name, 'a', '@', 'g') AS subbed,
        | translate(p_brand, 'Brand#', 'brnd-0') AS xlated,
        | lpad(p_type, 12, '.') AS padded_l,
        | rpad(p_type, 12, '.') AS padded_r,
        | repeat(substring(p_name, 1, 2), 3) AS tripled,
        | reverse(p_name) AS reversed
        |FROM part WHERE p_partkey % 73 = 0""".stripMargin,
    // DuckDB has TRY_CAST but no try_divide → CASE emulation
    "f11_try" ->
      """SELECT l_orderkey, l_linenumber,
        | round(CASE WHEN l_discount = 0.0 THEN NULL
        |            ELSE l_extendedprice / l_discount END, 4) AS price_per_disc,
        | CAST(NULL AS DOUBLE) AS div_zero,
        | TRY_CAST(l_returnflag AS INT) AS bad_cast,
        | CAST(l_linenumber AS VARCHAR) AS ok_cast
        |FROM lineitem WHERE l_orderkey % 97 = 0""".stripMargin,
  )
}
