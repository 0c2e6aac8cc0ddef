package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function library — SURVEY §2.8: strings + regex
  * (`cpp/src/strings`, `cpp/include/cudf/strings/`), datetime
  * (`cpp/include/cudf/datetime.hpp`), math/binary ops
  * (`unary.hpp:119-142`, `binaryop.hpp:39-89`), null utilities
  * (`replace.hpp:55-289`), lists (`cpp/src/lists`), JSON
  * (`json/json.hpp:165`), hashing (`hashing.hpp`).
  *
  * Transcendentals (sin/exp/log/…) are correctly-rounded only to ~1 ulp
  * and the libraries differ, so those outputs are rounded to 6 dp — a
  * collision with the rounding boundary needs an ulp-scale coincidence.
  * Everything else (string ops, integer math, IEEE +-*�/sqrt) is exact.
  */
object Functions {

  /** case/pad/trim/slice/find surface (strings/{case,padding,strip,slice,
    * find}.hpp) — one fused projection over part names.
    */
  private def strBasic(s: SparkSession, dir: String): DataFrame =
    Tables
      .part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 2, 5).as("sub"),
        lpad(col("p_partkey").cast(StringType), 8, "0").as("zfilled"),
        rpad(col("p_brand"), 10, ".").as("padded"),
        trim(lit("  x  ")).as("trimmed"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("replaced"),
        reverse(col("p_brand")).as("rev"),
        repeat(col("p_type"), 2).as("doubled"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        instr(col("p_name"), "e").as("find_e"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        col("p_name").startsWith("small").cast(IntegerType).as("starts_small"),
        col("p_name").endsWith("bolt").cast(IntegerType).as("ends_bolt"),
        col("p_name").contains("gear").cast(IntegerType).as("has_gear"))

  private val strBasicSql =
    """SELECT p_partkey,
      |  upper(p_name) AS up, lower(p_brand) AS lo, length(p_name) AS len,
      |  substring(p_name, 2, 5) AS sub,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS zfilled,
      |  rpad(p_brand, 10, '.') AS padded,
      |  trim('  x  ') AS trimmed,
      |  replace(p_name, ' ', '_') AS replaced,
      |  reverse(p_brand) AS rev,
      |  repeat(p_type, 2) AS doubled,
      |  concat_ws('|', p_brand, p_type) AS joined,
      |  instr(p_name, 'e') AS find_e,
      |  (string_split(p_name, ' '))[1] AS first_word,
      |  CAST(starts_with(p_name, 'small') AS INT) AS starts_small,
      |  CAST(ends_with(p_name, 'bolt') AS INT) AS ends_bolt,
      |  CAST(contains(p_name, 'gear') AS INT) AS has_gear
      |FROM part""".stripMargin

  /** regex surface: contains_re/extract/replace_re/count_re
    * (strings/contains.hpp:58, extract.hpp:61, replace_re.hpp:55).
    */
  private def strRegex(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .filter(col("doc_id") < 500)
      .select(
        col("doc_id"),
        col("text").rlike("qu[ae]").cast(IntegerType).as("matches"),
        regexp_extract(col("text"), "(\\w+) (\\w+)", 2).as("second_word"),
        regexp_replace(col("text"), "[aeiou]", "").as("devoweled_prefix"),
        size(split(col("text"), "a", -1)).minus(1).as("count_a"))

  private val strRegexSql =
    """SELECT doc_id,
      |  CAST(regexp_matches(text, 'qu[ae]') AS INT) AS matches,
      |  regexp_extract(text, '(\w+) (\w+)', 2) AS second_word,
      |  regexp_replace(text, '[aeiou]', '', 'g') AS devoweled_prefix,
      |  len(string_split(text, 'a')) - 1 AS count_a
      |FROM documents WHERE doc_id < 500""".stripMargin

  /** to/from timestamp conversions (strings/convert/convert_datetime.hpp:
    * 86,246): format → parse round-trip.
    */
  private def strDatetimeConv(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("formatted"),
        to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
          .cast(DateType).as("reparsed_date"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))

  private val strDatetimeConvSql =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS formatted,
      |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE)
      |    AS reparsed_date,
      |  epoch_us(o_orderdate) // 1000000 AS epoch_s
      |FROM orders""".stripMargin

  /** datetime component extraction + calendrical math (datetime.hpp:69-302:
    * extract_datetime_component, last_day_of_month, day_of_year,
    * add_calendrical_months, extract_quarter, floor_datetimes).
    */
  private def dtExtract(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofyear(col("o_orderdate")).as("doy"),
        weekday(col("o_orderdate")).as("wd_mon0"),
        hour(col("o_orderdate")).as("hr"),
        last_day(col("o_orderdate")).as("month_end"),
        add_months(col("o_orderdate"), 2).as("plus_2mo"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
        datediff(lit("2001-12-31").cast(DateType), col("o_orderdate")).as("days_to_end"))

  private val dtExtractSql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
      |  CAST(isodow(o_orderdate) - 1 AS INT) AS wd_mon0,
      |  CAST(hour(o_orderdate) AS INT) AS hr,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  datediff('day', CAST(o_orderdate AS DATE), DATE '2001-12-31')
      |    AS days_to_end
      |FROM orders""".stripMargin

  /** Calendar names, ISO week calendar, and boundary flags (pandas dt
    * accessor surface: day_name/month_name/isocalendar/weekday and the
    * is_leap_year / is_month_start/end / is_quarter_start /
    * is_year_start predicate family — `cudf/core/series.py` dt
    * accessor; libcudf `datetime.hpp:202` is_leap_year, `:93`
    * last_day_of_month). All pure projections in whole-stage codegen.
    * ISO year comes from extract(YEAROFWEEK) ↔ DuckDB isoyear();
    * names from date_format EEEE/MMMM ↔ dayname()/monthname() (both
    * English on this gate — Spark's default locale and DuckDB's only
    * one); leap year spelled as the Gregorian rule on both sides.
    */
  private def dtCalendarFlags(s: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate")
    val yr = year(d)
    Tables
      .orders(s, dir)
      .select(
        col("o_orderkey"),
        date_format(d, "EEEE").as("day_nm"),
        date_format(d, "MMMM").as("month_nm"),
        weekofyear(d).as("iso_week"),
        expr("extract(YEAROFWEEK FROM o_orderdate)")
          .cast(IntegerType)
          .as("iso_year"),
        (yr % 4 === 0 && (yr % 100 =!= 0 || yr % 400 === 0))
          .as("is_leap"),
        (dayofmonth(d) === 1).as("is_month_start"),
        (d === last_day(d)).as("is_month_end"),
        (d === date_trunc("quarter", d).cast(DateType))
          .as("is_quarter_start"),
        (dayofmonth(d) === 1 && month(d) === 1).as("is_year_start"))
  }

  private val dtCalendarFlagsSql =
    """SELECT o_orderkey,
      |  dayname(o_orderdate) AS day_nm,
      |  monthname(o_orderdate) AS month_nm,
      |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
      |  CAST(isoyear(o_orderdate) AS INT) AS iso_year,
      |  (year(o_orderdate) % 4 = 0 AND (year(o_orderdate) % 100 <> 0
      |    OR year(o_orderdate) % 400 = 0)) AS is_leap,
      |  day(o_orderdate) = 1 AS is_month_start,
      |  CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE))
      |    AS is_month_end,
      |  CAST(o_orderdate AS DATE)
      |    = CAST(date_trunc('quarter', o_orderdate) AS DATE)
      |    AS is_quarter_start,
      |  (day(o_orderdate) = 1 AND month(o_orderdate) = 1) AS is_year_start
      |FROM orders""".stripMargin

  /** unary math (unary.hpp:119-142) + round/bround (round.hpp:75) +
    * clamp (replace.hpp:219). Transcendentals rounded to 6 dp.
    */
  private def mathUnary(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        ceil(col("c_acctbal")).as("ceil_bal"),
        floor(col("c_acctbal")).as("floor_bal"),
        round(col("c_acctbal"), 1).as("round_1"),
        // HALF_EVEN exercised on exact .5 binary ties (engines agree there;
        // fractional-cents ties hit repr-vs-binary rounding divergence).
        bround(floor(col("c_acctbal")).cast(DoubleType) + 0.5).as("bround_half"),
        sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
        round(exp(col("c_acctbal") / 10000), 6).as("exp_6dp"),
        round(log(abs(col("c_acctbal")) + 1), 6).as("ln_6dp"),
        round(sin(col("c_acctbal") / 1000), 6).as("sin_6dp"),
        round(atan(col("c_acctbal") / 1000), 6).as("atan_6dp"),
        greatest(least(col("c_acctbal"), lit(5000d)), lit(-5000d)).as("clamped"),
        negate(col("c_acctbal")).as("negated"),
        (col("c_custkey").cast(IntegerType).bitwiseXOR(255)).as("xor255"))

  private val mathUnarySql =
    """SELECT c_custkey,
      |  abs(c_acctbal) AS abs_bal,
      |  CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
      |  CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
      |  round(c_acctbal, 1) AS round_1,
      |  round_even(floor(c_acctbal) + 0.5, 0) AS bround_half,
      |  sqrt(abs(c_acctbal)) AS sqrt_bal,
      |  round(exp(c_acctbal / 10000), 6) AS exp_6dp,
      |  round(ln(abs(c_acctbal) + 1), 6) AS ln_6dp,
      |  round(sin(c_acctbal / 1000), 6) AS sin_6dp,
      |  round(atan(c_acctbal / 1000), 6) AS atan_6dp,
      |  greatest(least(c_acctbal, 5000), -5000) AS clamped,
      |  -c_acctbal AS negated,
      |  xor(CAST(c_custkey AS INT), 255) AS xor255
      |FROM customer""".stripMargin

  /** binary ops (binaryop.hpp:39-89): pmod, int pow, shifts, bitwise,
    * null-aware max/min (NULL_MAX/NULL_MIN → greatest/least).
    */
  private def mathBinary(s: SparkSession, dir: String): DataFrame =
    Tables
      .supplier(s, dir)
      .select(
        col("s_suppkey"),
        pmod(col("s_suppkey") - 7, lit(5)).as("pmod5"),
        ((col("s_suppkey") - 7) % 5).as("mod5"),
        pow(lit(2), col("s_suppkey") % 10).as("pow2"),
        shiftleft(col("s_suppkey"), 3).as("shl3"),
        shiftright(col("s_suppkey"), 1).as("shr1"),
        (col("s_suppkey").bitwiseAND(12)).as("band"),
        (col("s_suppkey").bitwiseOR(5)).as("bor"),
        atan2(col("s_acctbal"), lit(100d)).as("atan2_raw"))
      .withColumn("atan2_6dp", round(col("atan2_raw"), 6))
      .drop("atan2_raw")

  private val mathBinarySql =
    """SELECT s_suppkey,
      |  ((s_suppkey - 7) % 5 + 5) % 5 AS pmod5,
      |  (s_suppkey - 7) % 5 AS mod5,
      |  pow(2, s_suppkey % 10) AS pow2,
      |  s_suppkey << 3 AS shl3,
      |  s_suppkey >> 1 AS shr1,
      |  s_suppkey & 12 AS band,
      |  s_suppkey | 5 AS bor,
      |  round(atan2(s_acctbal, 100), 6) AS atan2_6dp
      |FROM supplier""".stripMargin

  /** null utilities (replace.hpp:55-289, unary.hpp:174-256): coalesce,
    * fillna, nullif, null-safe compare, nan handling.
    */
  private def nullUtils(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        when(col("value") < 15, null).otherwise(col("value")).as("v"),
        when(col("event_id") % 7 === 0, Double.NaN)
          .otherwise(col("value")).as("maybe_nan"))
      .select(
        col("event_id"),
        coalesce(col("v"), lit(-1d)).as("filled"),
        col("v").isNull.cast(IntegerType).as("is_null"),
        col("v").isNotNull.cast(IntegerType).as("is_valid"),
        (col("v") <=> lit(null)).cast(IntegerType).as("null_safe_eq_null"),
        isnan(col("maybe_nan")).cast(IntegerType).as("is_nan"),
        nanvl(col("maybe_nan"), lit(0d)).as("nan_replaced"),
        nullif(col("v"), lit(100d)).as("nullifed"))

  private val nullUtilsSql =
    """SELECT event_id,
      |  coalesce(v, -1) AS filled,
      |  CAST(v IS NULL AS INT) AS is_null,
      |  CAST(v IS NOT NULL AS INT) AS is_valid,
      |  CAST(v IS NOT DISTINCT FROM NULL AS INT) AS null_safe_eq_null,
      |  CAST(isnan(maybe_nan) AS INT) AS is_nan,
      |  CASE WHEN isnan(maybe_nan) THEN 0.0 ELSE maybe_nan END AS nan_replaced,
      |  nullif(v, 100) AS nullifed
      |FROM (SELECT event_id,
      |        CASE WHEN value < 15 THEN NULL ELSE value END AS v,
      |        CASE WHEN event_id % 7 = 0 THEN 'NaN'::DOUBLE ELSE value END
      |          AS maybe_nan
      |      FROM events)""".stripMargin

  /** list/array ops (cpp/src/lists; cudf lists headers) over embeddings. */
  private def listOps(s: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast(DoubleType).as("first_elem"),
        array_max(col("embedding")).cast(DoubleType).as("max_elem"),
        array_min(col("embedding")).cast(DoubleType).as("min_elem"),
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))")
          .as("sum_elems"),
        graft.ArrCanon.joined(graft.ArrCanon.fixArr(
          expr("transform(slice(embedding, 1, 3), x -> CAST(x AS DOUBLE))")))
          .as("head3_fixed"),
        expr("size(filter(embedding, x -> x > 0))").as("n_positive"))

  private val listOpsSql =
    s"""SELECT vec_id,
      |  len(embedding) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS first_elem,
      |  CAST(list_max(embedding) AS DOUBLE) AS max_elem,
      |  CAST(list_min(embedding) AS DOUBLE) AS min_elem,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE))),
      |    (acc, x) -> acc + x) AS sum_elems,
      |  ${graft.ArrCanon.joinedSql(graft.ArrCanon.fixArrSql(
           "list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))"))}
      |    AS head3_fixed,
      |  len(list_filter(embedding, x -> x > 0)) AS n_positive
      |FROM embeddings""".stripMargin

  /** array set ops (lists/set_operations.hpp:61-172) on token arrays. */
  private def arraySetOps(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .filter(col("doc_id") < 300)
      .select(
        col("doc_id"),
        slice(split(col("text"), " "), 1, 8).as("a"),
        slice(split(col("text"), " "), 5, 8).as("b"))
      .select(
        col("doc_id"),
        graft.ArrCanon.joined(sort_array(array_intersect(col("a"), col("b")))).as("inter"),
        graft.ArrCanon.joined(sort_array(array_union(col("a"), col("b")))).as("uni"),
        graft.ArrCanon.joined(sort_array(array_except(col("a"), col("b")))).as("diff"),
        arrays_overlap(col("a"), col("b")).as("overlaps"),
        graft.ArrCanon.joined(sort_array(array_distinct(col("a")))).as("dedup_a"))

  private val arraySetOpsSql = {
    import graft.ArrCanon.joinedSql
    s"""SELECT doc_id,
      |  ${joinedSql("list_sort(list_intersect(a, b))")} AS inter,
      |  ${joinedSql("list_sort(list_distinct(a || b))")} AS uni,
      |  ${joinedSql("list_sort(list_filter(list_distinct(a), x -> NOT list_contains(b, x)))")}
      |    AS diff,
      |  len(list_intersect(a, b)) > 0 AS overlaps,
      |  ${joinedSql("list_sort(list_distinct(a))")} AS dedup_a
      |FROM (SELECT doc_id,
      |        (string_split(text, ' '))[1:8] AS a,
      |        (string_split(text, ' '))[5:12] AS b
      |      FROM documents WHERE doc_id < 300)""".stripMargin
  }

  /** get_json_object with JSONPath (json/json.hpp:165). */
  private def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
        get_json_object(col("props"), "$.missing").as("absent"))

  private val jsonExtractSql =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  json_extract_string(props, '$.missing') AS absent
      |FROM events""".stripMargin

  /** hashing (hashing.hpp): md5 (:94), sha256 (sha2 family :108-164) —
    * the portably-oracled subset; Spark-native murmur3/xxhash64/crc32
    * live in `hash_spark_native` (rows-only check + ScalaTest golden).
    */
  private def hashPortable(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        md5(col("text").cast(BinaryType)).as("md5_hex"),
        sha2(col("text").cast(BinaryType), 256).as("sha256_hex"))

  private val hashPortableSql =
    """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
      |FROM documents""".stripMargin

  /** murmur3_x86_32 (hashing.hpp:60 — same algorithm as Spark `hash`),
    * xxhash_64 (:201), crc32. No portable DuckDB twin → rows-only.
    */
  private def hashSparkNative(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        hash(col("text")).as("murmur3_32"),
        xxhash64(col("text")).as("xxh64"),
        crc32(col("text").cast(BinaryType)).as("crc"))

  /** MapType surface (SURVEY §1.2's MapType-superset claim; reference
    * has no first-class map — cudf dictionaries are encodings, so this
    * is engine-substrate capability the library exposes): build a REAL
    * MapType column per order — `map_from_entries` over the k-sorted
    * per-line entries ((l_orderkey, l_linenumber) is NOT unique in this
    * testdata, so quantities pre-aggregate per line to keep map keys
    * unique; Spark's default map-key dedup policy is EXCEPTION) — then
    * exercise map_keys / map_values / element_at / map_concat /
    * map_filter / transform_values, projecting scalars so the driver's
    * canonical compare applies. DuckDB 1.0 mirrors the construction
    * with its own MAP functions (map_from_entries / map_keys /
    * map_values / cardinality / element_at / map_concat); the lambda
    * ops, which DuckDB lacks on MAP, are oracled via list_filter over
    * the key list and direct arithmetic — same values.
    *
    * Scale shape: one map-side-combined per-line aggregate, then one
    * per-order aggregate — the same two-exchange shape as any grouped
    * collect; every map is bounded by the 7-line order width, so row
    * width never scales with SF.
    */
  private def mapOps(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(floor(col("l_quantity") * 100).cast(LongType)).as("v"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(
        struct(col("l_linenumber").as("k"), col("v")))).as("es"))
      .select(col("l_orderkey"), map_from_entries(col("es")).as("m"))
      .select(
        col("l_orderkey"),
        size(col("m")).as("n_lines"),
        graft.ArrCanon.joined(map_keys(col("m"))).as("keys_str"),
        graft.ArrCanon.joined(map_values(col("m"))).as("vals_str"),
        element_at(col("m"), lit(1)).as("qty1_cents"),
        size(map_concat(col("m"),
          map_from_arrays(array(lit(0)), array(lit(-1L))))).as("n_concat"),
        size(map_filter(col("m"), (k, _) => k % 2 === 0)).as("n_even"),
        element_at(transform_values(col("m"), (_, v) => v * 2), lit(1))
          .as("qty1_dbl"))

  private val mapOpsSql =
    s"""WITH per_line AS (
       |  SELECT l_orderkey, l_linenumber AS k,
       |    CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS v
       |  FROM lineitem GROUP BY l_orderkey, l_linenumber),
       |es AS (
       |  SELECT l_orderkey, list({'k': k, 'v': v} ORDER BY k) AS es
       |  FROM per_line GROUP BY l_orderkey),
       |mm AS (SELECT l_orderkey, map_from_entries(es) AS m FROM es)
       |SELECT l_orderkey,
       |  CAST(cardinality(m) AS INTEGER) AS n_lines,
       |  ${graft.ArrCanon.joinedSql("map_keys(m)")} AS keys_str,
       |  ${graft.ArrCanon.joinedSql("map_values(m)")} AS vals_str,
       |  map_extract(m, 1)[1] AS qty1_cents,
       |  CAST(cardinality(map_concat(m, MAP([0], [CAST(-1 AS BIGINT)])))
       |    AS INTEGER) AS n_concat,
       |  CAST(len(list_filter(map_keys(m), k -> k % 2 = 0)) AS INTEGER)
       |    AS n_even,
       |  map_extract(m, 1)[1] * 2 AS qty1_dbl
       |FROM mm""".stripMargin

  /** digitize (pandas API surface: `cudf/core/series.py:3399`; libcudf
    * `labeling/label_bins.hpp` inclusive-edge variants, numpy
    * semantics over ascending bin edges): per-row bin index against the
    * literal edge ladder [10, 20, 30, 40] over l_quantity —
    * bin_left = #{edge ≤ x} (right=False), bin_right = #{edge < x}
    * (right=True). A pure comparison-sum projection: whole-stage
    * codegen, no shuffle, edge count is a compile-time constant — the
    * shape is embarrassingly parallel at any SF (cut/qcut cover the
    * data-derived-edge variants).
    */
  private def digitize(s: SparkSession, dir: String): DataFrame = {
    val edges = Seq(10d, 20d, 30d, 40d)
    val q = col("l_quantity")
    def countWhere(cmp: Double => Column): Column =
      edges
        .map(e => cmp(e).cast(LongType))
        .reduce(_ + _)
    Tables
      .lineitem(s, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        q.as("qty"),
        countWhere(e => (q >= e)).as("bin_left"),
        countWhere(e => (q > e)).as("bin_right"))
  }

  private val digitizeSql =
    """SELECT l_orderkey, l_linenumber, l_quantity AS qty,
      |  CAST(l_quantity >= 10 AS BIGINT) + CAST(l_quantity >= 20 AS BIGINT)
      |    + CAST(l_quantity >= 30 AS BIGINT) + CAST(l_quantity >= 40 AS BIGINT)
      |    AS bin_left,
      |  CAST(l_quantity > 10 AS BIGINT) + CAST(l_quantity > 20 AS BIGINT)
      |    + CAST(l_quantity > 30 AS BIGINT) + CAST(l_quantity > 40 AS BIGINT)
      |    AS bin_right
      |FROM lineitem""".stripMargin

  def queries: Map[String, Q] = Map(
    "math_digitize" -> Q(digitize _, digitizeSql),
    "map_ops" -> Q(mapOps _, mapOpsSql),
    "str_basic" -> Q(strBasic _, strBasicSql),
    "str_regex" -> Q(strRegex _, strRegexSql),
    "str_datetime_conv" -> Q(strDatetimeConv _, strDatetimeConvSql),
    "dt_extract" -> Q(dtExtract _, dtExtractSql),
    "dt_calendar_flags" -> Q(dtCalendarFlags _, dtCalendarFlagsSql),
    "math_unary" -> Q(mathUnary _, mathUnarySql),
    "math_binary" -> Q(mathBinary _, mathBinarySql),
    "null_utils" -> Q(nullUtils _, nullUtilsSql),
    "list_ops" -> Q(listOps _, listOpsSql),
    "array_set_ops" -> Q(arraySetOps _, arraySetOpsSql),
    "json_extract" -> Q(jsonExtract _, jsonExtractSql),
    "hash_portable" -> Q(hashPortable _, hashPortableSql),
    "hash_spark_native" -> Q(hashSparkNative _, None)
  )
}
