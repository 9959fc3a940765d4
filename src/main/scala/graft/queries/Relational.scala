package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory over the TPC-H-ish testdata — each entry
  * maps one operator family from SURVEY.md §2 (filter/projection, aggregate,
  * joins incl. semi/anti/lookup, distinct, union, window functions, unnest,
  * rollup, scalar/JSON functions) to an idiomatic DataFrame program with a
  * DuckDB oracle.
  *
  * Scale notes are per query: broadcast the dimension side, shuffle only on
  * declared keys, keep everything inside whole-stage codegen.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[Q] = Seq(

    // ── stateless filter + projection (ArrowValue / Projection operators;
    //    predicate pushdown + column pruning reach the parquet scan)
    Q("q_filter_project",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_discount") < 0.03 && col("l_quantity") < 10)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // exact decimal product (round(double) differs between engines at
          // .5 boundaries), cast back to double
          (col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1.0) - col("l_discount")).cast(DecimalType(18, 4)))
            .cast("double").as("net_price"),
          col("l_shipdate")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS net_price,
             |  CAST(l_shipdate AS TIMESTAMP) AS l_shipdate
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_discount < 0.03 AND l_quantity < 10""".stripMargin)),

    // ── grouped aggregate battery, TPC-H Q1 shape (partial→final agg split
    //    is Catalyst's; shuffle carries one row per (flag,status) pair)
    Q("q_agg",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revenue.as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${oSum("l_quantity")} AS sum_qty,
              |  ${oSum("l_extendedprice")} AS sum_base_price,
              |  $oRevenue AS sum_disc_price,
              |  ${oAvg("l_quantity")} AS avg_qty,
              |  ${oAvg("l_discount", 4)} AS avg_disc,
              |  COUNT(*) AS count_order
              |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ── statistical aggregate battery (reference every_aggregate.sql,
    //    sql-testing/src/test/queries/every_aggregate.sql): stddev/var/corr/
    //    covar/regr/median/bool/bit — rounded since these are genuinely
    //    floating-point on both engines
    Q("q_agg_stats",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(stddev_pop(col("l_quantity")), 6).as("sdp_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(var_pop(col("l_quantity")), 6).as("varp_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qe"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qe"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covarp_qe"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope_eq"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("icept_eq"),
          regr_count(col("l_extendedprice"), col("l_quantity")).cast("long").as("rcount_eq"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2_eq"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6).as("ravgx_eq"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 4).as("ravgy_eq"),
          round(regr_sxx(col("l_extendedprice"), col("l_quantity")), 2).as("rsxx_eq"),
          round(regr_syy(col("l_extendedprice"), col("l_quantity")), 2).as("rsyy_eq"),
          round(regr_sxy(col("l_extendedprice"), col("l_quantity")), 2).as("rsxy_eq"),
          round(median(col("l_quantity")), 6).as("med_qty"),
          bool_and(col("l_quantity") < 49.0).as("all_lt49"),
          bool_or(col("l_discount") > 0.09).as("any_disc9"),
          bit_and(col("l_linenumber")).cast("long").as("band_ln"),
          bit_or(col("l_linenumber")).cast("long").as("bor_ln"),
          bit_xor(col("l_linenumber")).cast("long").as("bxor_ln"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship")),
      Some("""SELECT l_returnflag,
             |  round(stddev_samp(l_quantity), 6) AS sd_qty,
             |  round(stddev_pop(l_quantity), 6) AS sdp_qty,
             |  round(var_samp(l_quantity), 6) AS var_qty,
             |  round(var_pop(l_quantity), 6) AS varp_qty,
             |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qe,
             |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qe,
             |  round(covar_pop(l_quantity, l_extendedprice), 4) AS covarp_qe,
             |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope_eq,
             |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept_eq,
             |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS rcount_eq,
             |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2_eq,
             |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS ravgx_eq,
             |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS ravgy_eq,
             |  round(regr_sxx(l_extendedprice, l_quantity), 2) AS rsxx_eq,
             |  round(regr_syy(l_extendedprice, l_quantity), 2) AS rsyy_eq,
             |  round(regr_sxy(l_extendedprice, l_quantity), 2) AS rsxy_eq,
             |  round(median(l_quantity), 6) AS med_qty,
             |  bool_and(l_quantity < 49.0) AS all_lt49,
             |  bool_or(l_discount > 0.09) AS any_disc9,
             |  CAST(bit_and(l_linenumber) AS BIGINT) AS band_ln,
             |  CAST(bit_or(l_linenumber) AS BIGINT) AS bor_ln,
             |  CAST(bit_xor(l_linenumber) AS BIGINT) AS bxor_ln,
             |  CAST(min(l_shipdate) AS TIMESTAMP) AS min_ship,
             |  CAST(max(l_shipdate) AS TIMESTAMP) AS max_ship
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ── ORDER BY + LIMIT with total tie-break (deterministic top-k; Spark
    //    TakeOrderedAndProject — no full sort at scale)
    Q("q_topk",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(25),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin)),

    // ── broadcast join chain: fact(customer) ⋈ dim(nation) ⋈ dim(region);
    //    both dims broadcast — zero shuffle of the fact side before the
    //    final small aggregation
    Q("q_join_broadcast",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal")),
      Some(s"""SELECT r_name, COUNT(*) AS n_cust, ${oSum("c_acctbal")} AS sum_bal
              |FROM customer
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name""".stripMargin)),

    // ── shuffle equi-join of the two big tables on the join key; AQE handles
    //    skew; count(distinct) rides the same shuffle
    Q("q_join_shuffle",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"),
          revenue.as("rev")),
      Some(s"""SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS n_orders,
              |  COUNT(*) AS n_items, $oRevenue AS rev
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |GROUP BY o_orderpriority""".stripMargin)),

    // ── multi-way join, TPC-H Q5 shape: two shuffle joins on the fact
    //    chain + three broadcast dims; the flagship `entry` query
    Q("q_multi_join",
      (s, dir) => {
        val orders = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        t(s, dir, "customer")
          .join(orders, col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "supplier")),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(revenue.as("rev"), count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT n_name, $oRevenue AS rev, COUNT(*) AS n_items
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON l_orderkey = o_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
              |GROUP BY n_name""".stripMargin)),

    // ── left-semi join (EXISTS decorrelation — reference gets these from
    //    DataFusion's DecorrelatePredicateSubquery, SURVEY §2.3)
    Q("q_semi_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_active")),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_active FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment""".stripMargin)),

    // ── left-anti join (NOT EXISTS)
    Q("q_anti_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_no_urgent")),
      Some("""SELECT n_name, COUNT(*) AS n_no_urgent FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY n_name""".stripMargin)),

    // ── DISTINCT (reference: ReplaceDistinctWithAggregate)
    Q("q_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // ── distinct aggregates (reference keeps DataFusion with_distinct path)
    Q("q_agg_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
             |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ── UNION ALL of heterogeneous branches (reference RemoteTableExtension
    //    materialization; Spark unions are free)
    Q("q_union",
      (s, dir) => {
        val c = t(s, dir, "customer").select(lit("customer").as("src"),
          col("c_custkey").as("k"), col("c_acctbal").as("bal"))
        val su = t(s, dir, "supplier").select(lit("supplier").as("src"),
          col("s_suppkey").as("k"), col("s_acctbal").as("bal"))
        c.union(su).groupBy(col("src"))
          .agg(count(lit(1)).as("n"), dsum(col("bal")).as("sum_bal"))
      },
      Some(s"""SELECT src, COUNT(*) AS n, ${oSum("bal")} AS sum_bal FROM (
              |  SELECT 'customer' AS src, c_custkey AS k, c_acctbal AS bal FROM customer
              |  UNION ALL
              |  SELECT 'supplier' AS src, s_suppkey AS k, s_acctbal AS bal FROM supplier
              |) GROUP BY src""".stripMargin)),

    // ── INTERSECT / EXCEPT (Spark-native superset; reference lowers these
    //    to semi/anti joins)
    Q("q_intersect",
      (s, dir) => t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
        .intersect(t(s, dir, "orders").filter(col("o_orderpriority") === "5-LOW")
          .select(col("o_custkey"))),
      Some("""SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin)),

    // ── EXCEPT (set difference; reference lowers to anti join)
    Q("q_except",
      (s, dir) => t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
        .except(t(s, dir, "orders").filter(col("o_orderpriority") === "5-LOW")
          .select(col("o_custkey"))),
      Some("""SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin)),

    // ── array/struct type surface (SURVEY §1.2): construction, access,
    //    slicing, sort, containment, zip — over the embeddings list column
    Q("q_array_fns",
      (s, dir) => Tables.load(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(col("embedding").getItem(0).cast("double"), 6).as("first"),
          round(element_at(col("embedding"), -1).cast("double"), 6).as("last"),
          round(array_max(col("embedding")).cast("double"), 6).as("mx"),
          round(array_min(col("embedding")).cast("double"), 6).as("mn"),
          size(filter(col("embedding"), x => x > 0.0f)).as("n_pos"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double")), 6).as("sum_all"),
          round(slice(col("embedding"), 1, 4).getItem(2).cast("double"), 6).as("third")),
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS INTEGER) AS dim,
             |  round(CAST(embedding[1] AS DOUBLE), 6) AS first,
             |  round(CAST(embedding[-1] AS DOUBLE), 6) AS last,
             |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
             |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS mn,
             |  CAST(len(list_filter(embedding, x -> x > 0.0)) AS INTEGER) AS n_pos,
             |  round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
             |                    (acc, x) -> acc + x), 6) AS sum_all,
             |  round(CAST(embedding[3] AS DOUBLE), 6) AS third
             |FROM embeddings""".stripMargin)),

    // ── SQL window functions (reference WindowFunction operator,
    //    window_fn.rs): rank within partition, deterministic tie-break
    Q("q_window_fn",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn <= 3""".stripMargin)),

    // ── lag/lead + running aggregate window functions
    Q("q_window_analytic",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            round(sum(col("o_totalprice").cast(DecimalType(18, 2))).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"), 2)
              .as("running_total"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS running_total
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // ── ROLLUP (Spark-native superset of the reference's grouping surface)
    Q("q_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty")),
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
              |  COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // ── scalar function battery: string/date/conditional (SURVEY §2.4 —
    //    DataFusion's scalar library ⊂ Spark's built-ins)
    Q("q_scalar_fns",
      (s, dir) => t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          upper(col("o_orderpriority")).as("pri_upper"),
          substring(col("o_orderpriority"), 1, 1).as("pri_code"),
          length(col("o_orderpriority")).as("pri_len"),
          concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("status_pri"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("price_band"),
          abs(col("o_totalprice") - 150000.0).as("dist_150k"),
          floor(col("o_totalprice") / 50000).cast("long").as("bucket50k")),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INTEGER) AS yr,
             |  CAST(month(o_orderdate) AS INTEGER) AS mon,
             |  CAST(day(o_orderdate) AS INTEGER) AS dom,
             |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             |  upper(o_orderpriority) AS pri_upper,
             |  substring(o_orderpriority, 1, 1) AS pri_code,
             |  CAST(length(o_orderpriority) AS INTEGER) AS pri_len,
             |  concat_ws('|', o_orderstatus, o_orderpriority) AS status_pri,
             |  CASE WHEN o_totalprice > 300000 THEN 'high'
             |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
             |  abs(o_totalprice - 150000.0) AS dist_150k,
             |  CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket50k
             |FROM orders""".stripMargin)),

    // ── string-function battery (trim/pad/replace/regexp/split — the
    //    DataFusion string library surface, SURVEY §2.4)
    Q("q_string_fns",
      (s, dir) => t(s, dir, "part")
        .select(
          col("p_partkey"),
          trim(col("p_name")).as("name_trim"),
          lpad(col("p_brand"), 12, "_").as("brand_pad"),
          regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_first"),
          split(col("p_name"), " ").getItem(0).as("name_head"),
          reverse(col("p_brand")).as("brand_rev"),
          translate(col("p_brand"), "#", "-").as("brand_dash"),
          instr(col("p_name"), "a").cast("long").as("a_pos"),
          repeat(col("p_brand"), 2).as("brand_x2")),
      Some("""SELECT p_partkey,
             |  trim(p_name) AS name_trim,
             |  lpad(p_brand, 12, '_') AS brand_pad,
             |  regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
             |  regexp_extract(p_type, '^(\w+)', 1) AS type_first,
             |  string_split(p_name, ' ')[1] AS name_head,
             |  reverse(p_brand) AS brand_rev,
             |  replace(p_brand, '#', '-') AS brand_dash,
             |  CAST(instr(p_name, 'a') AS BIGINT) AS a_pos,
             |  repeat(p_brand, 2) AS brand_x2
             |FROM part""".stripMargin)),

    // ── time-function battery (date arithmetic / extraction / epoch)
    Q("q_time_fns",
      (s, dir) => t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_add(col("o_orderdate"), 30).as("plus30"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate")).as("days_to_y2k"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofweek(col("o_orderdate")).as("dow"),
          last_day(col("o_orderdate")).as("month_end")),
      Some("""SELECT o_orderkey,
             |  CAST(o_orderdate + INTERVAL '30 days' AS DATE) AS plus30,
             |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
             |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
             |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
             |FROM orders""".stripMargin)),

    // ── CUBE grouping (full grouping-set surface beyond ROLLUP)
    Q("q_cube",
      (s, dir) => t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"), col("sum_price")),
      Some(s"""SELECT coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS pri,
              |  COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
              |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // ── ranking-function battery: rank/dense_rank/ntile/percent_rank over
    //    a deterministic ordering
    Q("q_rank_fns",
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .select(
            col("c_custkey"), col("c_mktsegment"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("prank"))
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |  CAST(rank() OVER w AS INTEGER) AS rnk,
             |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
             |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             |  round(percent_rank() OVER w, 6) AS prank
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""".stripMargin)),

    // ── approximate aggregates (reference approx_distinct / approx_
    //    percentile via DataFusion; HLL++ / GK-sketch here — algorithms
    //    differ from DuckDB's, so rows-only + ApproxSpec bounds)
    Q("q_approx_aggs",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("approx_p95")),
      None),

    // ── approximate-aggregate ACCURACY, oracle-checked: the sketch values
    //    themselves are algorithm-specific (HLL++/GK here, HLL/t-digest in
    //    DataFusion/DuckDB), but their error CONTRACTS are not — emit
    //    booleans asserting each approximation lands within its published
    //    bound of the exact value, and let the oracle demand all-true.
    Q("q_approx_bounds",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("ad"),
          countDistinct(col("l_partkey")).as("ed"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("am"),
          expr("percentile(l_extendedprice, 0.5)").as("em"))
        .select(
          col("l_returnflag"),
          // HLL++ default rsd = 5%; allow 3 rsd
          (abs(col("ad") - col("ed")) <= col("ed") * 0.15 + lit(1)).as("distinct_ok"),
          // GK sketch at accuracy 10000: rank error ≤ n/10000 ⇒ value
          // stays within 1% of the exact median for this distribution
          (abs(col("am") - col("em")) <= abs(col("em")) * 0.01 + lit(1)).as("median_ok")),
      Some("""SELECT l_returnflag, true AS distinct_ok, true AS median_ok
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ── JSON path extraction (reference: datafusion-functions-json +
    //    get_first_json_object custom scalar, functions.rs:55-97)
    Q("q_json_fns",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(col("k")).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          (sum(col("k").cast("long")).cast("double") / count(col("k"))).as("avg_k"),
          count(when(col("k") > 50, 1)).as("n_gt50")),
      Some("""SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
             |  CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k,
             |  COUNT(CASE WHEN k > 50 THEN 1 END) AS n_gt50
             |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
             |GROUP BY event_type""".stripMargin)),

    // ── copy-on-write DML on the wire-format Delta log (r10): write
    //    lineitem into a fresh table, DELETE the high-quantity rows,
    //    UPDATE the returned rows' price, read the table back and
    //    aggregate. The oracle replays the same DML algebraically over
    //    the source parquet, so a hash match proves delete + update +
    //    snapshot-read end-to-end (stats pruning, touched-file rewrite,
    //    remove/add commit) — not just the operators in isolation.
    Q("q_delta_dml",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-delta-dml").resolve("t").toString
        graft.sinks.DeltaLog.writeBatch(li, table)
        graft.sinks.DeltaLog.deleteWhere(s, table, "l_quantity > 45")
        graft.sinks.DeltaLog.updateWhere(s, table,
          Seq("l_extendedprice" -> "l_extendedprice * 2"),
          Some("l_returnflag = 'R'"))
        graft.sinks.DeltaLog.read(s, table)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty,
              |  ${oSum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * 2 ELSE l_extendedprice END")} AS sum_price
              |FROM lineitem WHERE NOT (l_quantity > 45) GROUP BY 1""".stripMargin)),

    // ── the iceberg twin, on a PARTITIONED table: the UPDATE's partition
    //    predicate prunes the rewrite to the one matching partition via
    //    the manifest metrics; the overwrite snapshot + manifest-entry
    //    carry-through round-trips through the v2 avro metadata
    Q("q_iceberg_dml",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-dml").resolve("t").toString
        graft.sinks.IcebergLog.writeBatch(li, table,
          partitionBy = Seq("l_returnflag"))
        graft.sinks.IcebergLog.deleteWhere(s, table, "l_quantity > 45")
        graft.sinks.IcebergLog.updateWhere(s, table,
          Seq("l_extendedprice" -> "l_extendedprice * 2"),
          Some("l_returnflag = 'R'"))
        graft.sinks.IcebergLog.read(s, table)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty,
              |  ${oSum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * 2 ELSE l_extendedprice END")} AS sum_price
              |FROM lineitem WHERE NOT (l_quantity > 45) GROUP BY 1""".stripMargin)),

    // ── COLUMN-MAPPED delta interop (r13, DML r14): author the metaData
    //    of a mapped table (protocol 2/5, physicalName/id per field —
    //    the usual Databricks-written shape), APPEND lineitem through
    //    the mapped write path (physical-named files, field ids,
    //    phys-keyed stats/partitionValues), then run the FULL DML cycle
    //    on it — copy-on-write DELETE, an UPDATE, and a MERGE (matched
    //    update + not-matched inserts into a NEW partition) — and read
    //    back with a scan_filter. A hash match proves the whole mapping
    //    round trip — physical write, logical→physical DML rewrite,
    //    partition attach from the log, phys-keyed stats pruning,
    //    logical remap — against an exact engine replaying the same DML
    //    algebraically.
    Q("q_delta_mapped",
      (s, dir) => {
        import org.apache.spark.sql.types.{MetadataBuilder, StructType}
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-delta-cm").resolve("t").toString
        val mapped = StructType(li.schema.fields.zipWithIndex.map {
          case (f, i) => f.copy(metadata = new MetadataBuilder()
            .putLong("delta.columnMapping.id", i + 1L)
            .putString("delta.columnMapping.physicalName", s"col-p${i + 1}")
            .build())
        })
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val md = mapper.createObjectNode()
        val m = md.putObject("metaData")
        m.put("id", java.util.UUID.randomUUID().toString)
        m.putObject("format").put("provider", "parquet")
        m.set[com.fasterxml.jackson.databind.JsonNode]("schemaString",
          mapper.getNodeFactory.textNode(mapped.json))
        m.putArray("partitionColumns").add("l_returnflag")
        m.putObject("configuration")
          .put("delta.columnMapping.mode", "name")
          .put("delta.columnMapping.maxColumnId", "4")
        m.put("createdTime", 1700000000000L)
        val log = java.nio.file.Paths.get(table, "_delta_log")
        java.nio.file.Files.createDirectories(log)
        java.nio.file.Files.write(log.resolve(f"${0L}%020d.json"),
          ("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""" +
            "\n" + md.toString + "\n").getBytes("UTF-8"))
        graft.sinks.DeltaLog.writeBatch(li, table)
        graft.sinks.DeltaLog.deleteWhere(s, table, "l_quantity > 45")
        graft.sinks.DeltaLog.updateWhere(s, table,
          Seq("l_quantity" -> "l_quantity * 2"), Some("l_returnflag = 'R'"))
        // MERGE: rows whose key holds an original quantity ≤ 10 match
        // on (l_orderkey, l_linenumber) and reset to min(q0)+100 (the
        // synthetic lineitem is NOT key-unique, so the source dedupes
        // by min — MERGE refuses multi-matching sources by design); a
        // key-shifted copy inserts into a brand-new 'I' partition
        val srcAgg = li.filter(col("l_quantity") <= 10)
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(min(col("l_quantity")).as("l_quantity"))
        val source = srcAgg
          .select(col("l_orderkey"), col("l_linenumber"),
            lit("Z").as("l_returnflag"), col("l_quantity"))
          .unionByName(srcAgg.select(
            (col("l_orderkey") + 1000000000L).as("l_orderkey"),
            col("l_linenumber"), lit("I").as("l_returnflag"),
            (col("l_quantity") + 1000).as("l_quantity")))
        graft.sinks.DeltaLog.merge(s, table, source, graft.sinks.Merge.Clauses(
          "t", "s", "t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber",
          Seq(graft.sinks.Merge.MatchedClause(None,
            Left(Seq("l_quantity" -> "s.l_quantity + 100")))),
          Some((None, Seq.empty))))
        graft.sinks.DeltaLog.read(s, table,
            scanFilter = Some("l_quantity <= 25"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      },
      Some(s"""WITH src AS (
              |  SELECT l_orderkey, l_linenumber, MIN(l_quantity) AS sq
              |  FROM lineitem WHERE l_quantity <= 10 GROUP BY 1, 2
              |), base AS (
              |  SELECT l.l_returnflag,
              |    CASE WHEN s.l_orderkey IS NOT NULL THEN s.sq + 100
              |         WHEN l.l_returnflag = 'R' THEN l.l_quantity * 2
              |         ELSE l.l_quantity END AS q
              |  FROM lineitem l LEFT JOIN src s
              |    ON l.l_orderkey = s.l_orderkey AND l.l_linenumber = s.l_linenumber
              |  WHERE NOT (l.l_quantity > 45)
              |), merged AS (
              |  SELECT l_returnflag, q FROM base
              |  UNION ALL
              |  SELECT 'I' AS l_returnflag, sq + 1000 AS q FROM src
              |)
              |SELECT l_returnflag, COUNT(*) AS n, ${oSum("q")} AS sum_qty
              |FROM merged WHERE q <= 25 GROUP BY 1""".stripMargin)),

    // ── id-MODE mapped delta with a NESTED column (r15): CREATE under
    //    delta.columnMapping.mode=id (readers bind every column — nested
    //    leaves included — by parquet field id; the writer stamps ids at
    //    every depth through the external-row pass), then the DML cycle:
    //    a CoW DELETE, an UPDATE whose predicate reads a NESTED leaf,
    //    and a pruned read. A hash match proves id-mode placement,
    //    nested id stamping, id-resolved reads, and phys-keyed pruning.
    Q("q_delta_mapped_id",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          struct(col("l_linenumber").as("ln"),
            col("l_extendedprice").as("price")).as("meta"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-delta-cmid").resolve("t").toString
        graft.sinks.DeltaLog.writeBatch(li, table,
          partitionBy = Seq("l_returnflag"),
          tableConf = Map("delta.columnMapping.mode" -> "id"))
        graft.sinks.DeltaLog.deleteWhere(s, table, "l_quantity > 45")
        // the UPDATE sets BOTH a top-level column and a NESTED leaf
        // (r15 nested SET) off a nested predicate — old-row semantics
        graft.sinks.DeltaLog.updateWhere(s, table,
          Seq("l_quantity" -> "l_quantity * 2",
            "meta.price" -> "meta.price * 2"), Some("meta.ln >= 4"))
        graft.sinks.DeltaLog.read(s, table, scanFilter = Some("l_quantity <= 30"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("meta.price")).as("sum_price"))
      },
      Some(s"""WITH base AS (
              |  SELECT l_returnflag,
              |    CASE WHEN l_linenumber >= 4 THEN l_extendedprice * 2
              |         ELSE l_extendedprice END AS price,
              |    CASE WHEN l_linenumber >= 4 THEN l_quantity * 2
              |         ELSE l_quantity END AS q
              |  FROM lineitem WHERE NOT (l_quantity > 45)
              |)
              |SELECT l_returnflag, COUNT(*) AS n, ${oSum("q")} AS sum_qty,
              |  ${oSum("price")} AS sum_price
              |FROM base WHERE q <= 30 GROUP BY 1""".stripMargin)),

    // ── RENAME/DROP COLUMN on a mapped delta table (r15): CREATE with
    //    column mapping (the engine mints ids/physicalNames), append,
    //    RENAME l_quantity→qty (metaData-only; the physicalName binding
    //    keeps every existing file resolving), DML against the NEW name,
    //    DROP l_extendedprice, then RE-ADD a column of the dropped name —
    //    whose values must be all-null (fresh physicalName: old bytes
    //    stay dead). The read goes through a scan_filter on the renamed
    //    column, so phys-keyed stats pruning is exercised through the
    //    rename. A hash match proves the whole evolution cycle against
    //    DuckDB replaying the algebra.
    Q("q_delta_rename_drop",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-delta-rd").resolve("t").toString
        graft.sinks.DeltaLog.writeBatch(li, table,
          partitionBy = Seq("l_returnflag"),
          tableConf = Map("delta.columnMapping.mode" -> "name"))
        graft.sinks.DeltaLog.renameColumn(s, table, "l_quantity", "qty")
        graft.sinks.DeltaLog.deleteWhere(s, table, "qty > 45")
        graft.sinks.DeltaLog.updateWhere(s, table,
          Seq("qty" -> "qty * 2"), Some("l_returnflag = 'R'"))
        graft.sinks.DeltaLog.dropColumns(s, table, Seq("l_extendedprice"))
        graft.sinks.DeltaLog.addColumns(s, table,
          Seq("l_extendedprice" -> org.apache.spark.sql.types.DoubleType))
        graft.sinks.DeltaLog.read(s, table, scanFilter = Some("qty <= 60"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("qty")).as("sum_qty"),
            count(col("l_extendedprice")).as("n_resurrected"))
      },
      Some(s"""WITH base AS (
              |  SELECT l_returnflag,
              |    CASE WHEN l_returnflag = 'R' THEN l_quantity * 2
              |         ELSE l_quantity END AS qty
              |  FROM lineitem WHERE NOT (l_quantity > 45)
              |)
              |SELECT l_returnflag, COUNT(*) AS n, ${oSum("qty")} AS sum_qty,
              |  CAST(0 AS BIGINT) AS n_resurrected
              |FROM base WHERE qty <= 60 GROUP BY 1""".stripMargin)),

    // ── RENAME/DROP COLUMN on iceberg (r15): the twin cycle under
    //    field-id identity — rename appends a schema-history entry with
    //    the SAME id under the new name (pre-rename files resolve by
    //    parquet field id, the spec's Column Projection rule), drop
    //    retires the id (last-column-id high-water), and the re-added
    //    same-named column gets a FRESH id so old files read null.
    Q("q_iceberg_rename_drop",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-rd").toString
        graft.sinks.IcebergLog.writeBatch(li.repartition(4), table)
        graft.sinks.IcebergLog.renameColumn(s, table, "l_quantity", "qty")
        graft.sinks.IcebergLog.deleteWhere(s, table, "qty > 45")
        graft.sinks.IcebergLog.updateWhere(s, table,
          Seq("qty" -> "qty * 2"), Some("l_returnflag = 'R'"))
        graft.sinks.IcebergLog.dropColumns(s, table, Seq("l_extendedprice"))
        graft.sinks.IcebergLog.addColumns(s, table,
          Seq("l_extendedprice" -> org.apache.spark.sql.types.DoubleType))
        graft.sinks.IcebergLog.read(s, table, scanFilter = Some("qty <= 60"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("qty")).as("sum_qty"),
            count(col("l_extendedprice")).as("n_resurrected"))
      },
      Some(s"""WITH base AS (
              |  SELECT l_returnflag,
              |    CASE WHEN l_returnflag = 'R' THEN l_quantity * 2
              |         ELSE l_quantity END AS qty
              |  FROM lineitem WHERE NOT (l_quantity > 45)
              |)
              |SELECT l_returnflag, COUNT(*) AS n, ${oSum("qty")} AS sum_qty,
              |  CAST(0 AS BIGINT) AS n_resurrected
              |FROM base WHERE qty <= 60 GROUP BY 1""".stripMargin)),

    // ── NESTED types on the iceberg write path (r16): CREATE a
    //    partitioned iceberg table with a STRUCT column (path-keyed
    //    field ids minted past the top level, parquet ids stamped at
    //    every depth, footer metrics keyed by leaf id), then the DML
    //    cycle: a CoW DELETE, an UPDATE whose predicate reads a NESTED
    //    leaf AND whose SET writes one (withField postimages under
    //    old-row semantics), then a pruned read. A hash match proves
    //    the nested schema JSON, id minting, stamping, and nested DML
    //    against DuckDB replaying the algebra.
    Q("q_iceberg_nested",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          struct(col("l_linenumber").as("ln"),
            col("l_extendedprice").as("price")).as("meta"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-nested").toString
        graft.sinks.IcebergLog.writeBatch(li.repartition(4), table,
          partitionBy = Seq("l_returnflag"))
        graft.sinks.IcebergLog.deleteWhere(s, table, "l_quantity > 45")
        graft.sinks.IcebergLog.updateWhere(s, table,
          Seq("l_quantity" -> "l_quantity * 2",
            "meta.price" -> "meta.price * 2"), Some("meta.ln >= 4"))
        graft.sinks.IcebergLog.read(s, table, scanFilter = Some("l_quantity <= 30"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("meta.price")).as("sum_price"))
      },
      Some(s"""WITH base AS (
              |  SELECT l_returnflag,
              |    CASE WHEN l_linenumber >= 4 THEN l_extendedprice * 2
              |         ELSE l_extendedprice END AS price,
              |    CASE WHEN l_linenumber >= 4 THEN l_quantity * 2
              |         ELSE l_quantity END AS q
              |  FROM lineitem WHERE NOT (l_quantity > 45)
              |)
              |SELECT l_returnflag, COUNT(*) AS n, ${oSum("q")} AS sum_qty,
              |  ${oSum("price")} AS sum_price
              |FROM base WHERE q <= 30 GROUP BY 1""".stripMargin)),

    // ── iceberg v3 INITIAL-DEFAULT reads (r15): files written BEFORE a
    //    field existed return the field's `initial-default` (the spec's
    //    column-projection rule), while post-field files keep their own
    //    values — resolved per file from the adding snapshot's schema-id
    //    plus the manifest column metrics, never a guess. Construction:
    //    half of lineitem lands pre-field, the schema evolves, the other
    //    half lands WITH the column, then the metadata is reshaped to the
    //    iceberg-java-1.8 form (format-version 3 + initial-default on the
    //    added field). A hash match proves the fill against DuckDB
    //    computing the same split algebraically.
    Q("q_iceberg_initial_default",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_returnflag"), col("l_linenumber"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-idef").toString
        graft.sinks.IcebergLog.writeBatch(
          li.filter(col("l_orderkey") % 2 === 0), table)
        graft.sinks.IcebergLog.addColumns(s, table,
          Seq("bonus" -> org.apache.spark.sql.types.LongType))
        graft.sinks.IcebergLog.writeBatch(
          li.filter(col("l_orderkey") % 2 === 1)
            .withColumn("bonus", col("l_linenumber").cast("long") * 10L), table)
        // → the iceberg-java 1.8 shape: v3, initial-default on the field
        val dirM = java.nio.file.Paths.get(table, "metadata")
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val vf = {
          val it = java.nio.file.Files.list(dirM).iterator()
          var mx = -1
          while (it.hasNext) {
            val n = it.next().getFileName.toString
            if (n.startsWith("v") && n.endsWith(".metadata.json"))
              mx = math.max(mx,
                n.stripPrefix("v").stripSuffix(".metadata.json").toInt)
          }
          mx
        }
        val p = dirM.resolve(s"v$vf.metadata.json")
        val node = mapper.readTree(java.nio.file.Files.readAllBytes(p))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        node.put("format-version", 3)
        val curId = node.get("current-schema-id").asInt()
        val schemas = node.get("schemas")
        (0 until schemas.size()).map(schemas.get)
          .find(_.get("schema-id").asInt() == curId).get.get("fields")
          .forEach { f =>
            if (f.get("name").asText() == "bonus") {
              val o = f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
              o.put("initial-default", 7)
              // write-default too (the iceberg-java 1.8 shape sets both):
              // the omitted-column append below fills it at write time
              o.put("write-default", 7)
              ()
            }
          }
        java.nio.file.Files.write(p, node.toString.getBytes("UTF-8"))
        // r16: evolution on an initial-default table goes through — the
        // carried schema-entry nodes keep the default attributes. ADD a
        // column (new entry, defaults carried) and RENAME the default
        // field itself (same id under the new name); the fill must
        // still resolve through the evolved history. DML composes too:
        // the UPDATE's candidate reads FILL per file, so the predicate
        // on the default column matches pre-field rows on their filled
        // value, and the rewrite MATERIALIZES it (old-row semantics).
        graft.sinks.IcebergLog.addColumns(s, table,
          Seq("extra" -> org.apache.spark.sql.types.LongType))
        graft.sinks.IcebergLog.renameColumn(s, table, "bonus", "boon")
        graft.sinks.IcebergLog.updateWhere(s, table,
          Seq("boon" -> "boon + 100"),
          Some("boon = 7 AND l_linenumber >= 4"))
        // r17: the answer comes off the STREAMING view, not the batch
        // read — the snapshot materializes the FILLED shape (pre-field
        // files carry boon, renamed files resolve by field id), and a
        // per-commit add that OMITS the default column lands the
        // spec's write-default (7) in its file bytes before streaming
        val (sdf, view) = graft.sources.IcebergStreamSource.open(s, table)
        val qn = "idef_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val sq = sdf.writeStream.format("memory").queryName(qn)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
          .start()
        try {
          sq.processAllAvailable()
          graft.sinks.IcebergLog.writeBatch(
            li.filter(col("l_linenumber") === 1), table, mergeSchema = true)
          view.sync()
          sq.processAllAvailable()
        } finally { sq.stop(); view.close() }
        s.table(qn).filter(col("boon") >= 7)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("boon")).as("sum_bonus"))
      },
      Some("""WITH base AS (
             |  SELECT l_returnflag,
             |    CASE WHEN l_orderkey % 2 = 0 AND l_linenumber >= 4
             |         THEN 107
             |         WHEN l_orderkey % 2 = 0 THEN 7
             |         ELSE l_linenumber * 10 END AS boon
             |  FROM lineitem
             |  UNION ALL
             |  SELECT l_returnflag, 7 AS boon
             |  FROM lineitem WHERE l_linenumber = 1
             |)
             |SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(boon) AS BIGINT) AS sum_bonus
             |FROM base WHERE boon >= 7 GROUP BY 1""".stripMargin)),

    // ── delta ROW TRACKING (r16): the twin of the iceberg lineage
    //    story — a table whose protocol lists the rowTracking writer
    //    feature (the shape modern delta writers leave behind) takes
    //    this engine's appends, each add claiming fresh baseRowIds past
    //    the delta.rowTracking high-water mark; under a TOTAL sort into
    //    one file per append the ids are exactly ROW_NUMBER()-1. A DV
    //    DELETE retracts rows while survivors keep their positions —
    //    and therefore their ids. Pre-feature files stay untracked
    //    (null ids). sum_rid + per-row commit versions hash-match
    //    DuckDB replaying the algebra.
    Q("q_delta_row_tracking",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
        val sortCols = Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-delta-rt").resolve("t").toString
        graft.sinks.DeltaLog.writeBatch(
          li.filter(col("l_orderkey") % 2 === 0).repartition(1)
            .sortWithinPartitions(sortCols: _*), table)     // pre-feature
        // → the modern-writer shape: rowTracking + domainMetadata
        val v0 = java.nio.file.Paths.get(table, "_delta_log",
          f"${0L}%020d.json")
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val out = new java.lang.StringBuilder
        java.nio.file.Files.readAllLines(v0).forEach { line =>
          if (line.nonEmpty) {
            val n = mapper.readTree(line)
            if (n.has("protocol")) {
              val p = n.get("protocol")
                .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
              p.put("minReaderVersion", 1)
              p.put("minWriterVersion", 7)
              val wf = p.putArray("writerFeatures")
              Seq("rowTracking", "domainMetadata").foreach(wf.add)
            }
            out.append(n.toString).append('\n')
            ()
          }
        }
        java.nio.file.Files.write(v0, out.toString.getBytes("UTF-8"))
        graft.sinks.DeltaLog.clearSnapshotCache()
        graft.sinks.DeltaLog.writeBatch(
          li.filter(col("l_orderkey") % 2 === 1).repartition(1)
            .sortWithinPartitions(sortCols: _*), table)     // tracked
        graft.sinks.DeltaLog.setTableProperties(s, table,
          Map("delta.enableDeletionVectors" -> "true"))     // version 2
        graft.sinks.DeltaLog.deleteWhere(s, table,
          "l_orderkey % 2 = 1 AND l_quantity < 10")         // v3: DV retraction
        graft.sinks.DeltaLog.setTableProperties(s, table,
          Map("delta.enableDeletionVectors" -> "false"))    // version 4
        // CoW UPDATE (r16): the rewrite MATERIALIZES row ids — matched
        // rows keep their id and bump to this commit's version (5)
        graft.sinks.DeltaLog.updateWhere(s, table,
          Seq("l_quantity" -> "l_quantity + 100"),
          Some("l_orderkey % 2 = 1 AND l_quantity >= 40"))  // version 5
        graft.sinks.DeltaLog.readWithRowIds(s, table)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            count(col("_row_id")).as("n_with_id"),
            sum(col("_row_id")).as("sum_rid"),
            sum(col("_row_commit_version")).as("sum_ver"))
      },
      Some("""WITH odd AS (
             |  SELECT l_returnflag, l_quantity,
             |    ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber,
             |      l_quantity, l_returnflag) - 1 AS rid
             |  FROM lineitem WHERE l_orderkey % 2 = 1
             |), rows_after AS (
             |  SELECT l_returnflag, rid,
             |    CASE WHEN l_quantity >= 40 THEN 5 ELSE 1 END AS ver
             |  FROM odd WHERE NOT (l_quantity < 10)
             |  UNION ALL
             |  SELECT l_returnflag, NULL AS rid, NULL AS ver
             |  FROM lineitem WHERE l_orderkey % 2 = 0
             |)
             |SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(COUNT(rid) AS BIGINT) AS n_with_id,
             |  CAST(SUM(rid) AS BIGINT) AS sum_rid,
             |  CAST(SUM(ver) AS BIGINT) AS sum_ver
             |FROM rows_after GROUP BY 1""".stripMargin)),

    // ── iceberg v3 ROW LINEAGE (r15, DML-deep in r16): _row_id assigns
    //    per the spec — file first_row_id (from the adding snapshot's
    //    first-row-id) + row position — so under a TOTAL sort into one
    //    file the ids are exactly ROW_NUMBER()-1, which DuckDB can
    //    replay. Rows landed BEFORE the v3 upgrade carry null ids (the
    //    upgrade rule; seq 1). Then the DML story: a CoW UPDATE keeps
    //    every matched row's _row_id and BUMPS its
    //    _last_updated_sequence_number to the committing snapshot's
    //    sequence (3); a CoW DELETE removes rows while the survivors
    //    keep id AND sequence. sum_seq pins the full per-row sequence
    //    algebra (evens 1, odd unmatched 2, odd updated 3) — a hash
    //    match proves assignment, DML preservation, and bumping.
    Q("q_iceberg_row_lineage",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
        val sortCols = Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-rl").toString
        graft.sinks.IcebergLog.writeBatch(
          li.filter(col("l_orderkey") % 2 === 0).repartition(1)
            .sortWithinPartitions(sortCols: _*), table)       // seq 1 (pre-v3)
        graft.sinks.IcebergLog.setTableProperties(s, table,
          Map("format-version" -> "3"))
        graft.sinks.IcebergLog.writeBatch(
          li.filter(col("l_orderkey") % 2 === 1).repartition(1)
            .sortWithinPartitions(sortCols: _*), table)       // seq 2 (tracked)
        // mid-history DML, odd-file-scoped so the pre-v3 file stays
        // untouched (its untracked nulls would lazily assign on rewrite)
        graft.sinks.IcebergLog.updateWhere(s, table,           // seq 3
          Seq("l_quantity" -> "l_quantity + 100"),
          Some("l_orderkey % 2 = 1 AND l_quantity >= 40"))
        graft.sinks.IcebergLog.deleteWhere(s, table,           // seq 4
          "l_orderkey % 2 = 1 AND l_quantity < 10")
        graft.sinks.IcebergLog.readWithLineage(s, table)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            count(col("_row_id")).as("n_with_id"),
            sum(col("_row_id")).as("sum_rid"),
            sum(col("_last_updated_sequence_number")).as("sum_seq"))
      },
      Some("""WITH odd AS (
             |  SELECT l_returnflag, l_quantity,
             |    ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber,
             |      l_quantity, l_returnflag) - 1 AS rid
             |  FROM lineitem WHERE l_orderkey % 2 = 1
             |), rows_after AS (
             |  SELECT l_returnflag, rid,
             |    CASE WHEN l_quantity >= 40 THEN 3 ELSE 2 END AS seq
             |  FROM odd WHERE NOT (l_quantity < 10)
             |  UNION ALL
             |  SELECT l_returnflag, NULL AS rid, 1 AS seq
             |  FROM lineitem WHERE l_orderkey % 2 = 0
             |)
             |SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(COUNT(rid) AS BIGINT) AS n_with_id,
             |  CAST(SUM(rid) AS BIGINT) AS sum_rid,
             |  CAST(SUM(seq) AS BIGINT) AS sum_seq
             |FROM rows_after GROUP BY 1""".stripMargin)),

    // ── iceberg FORMAT-VERSION 3 interop (r13): run a merge-on-read
    //    DELETE, then re-shape the table the way a v3 writer leaves it —
    //    each position-delete parquet becomes a puffin DELETION VECTOR
    //    (fields 143-145 on a foreign-shaped manifest), metadata bumps
    //    to format-version 3 — and read back through the DV bitmap
    //    probe. The oracle replays the delete algebraically: a hash
    //    match proves the puffin blob framing, the manifest binding,
    //    and the v3 read path end-to-end.
    Q("q_iceberg_v3",
      (s, dir) => {
        import org.apache.spark.sql.types.{LongType, StringType, IntegerType, StructField, StructType}
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-v3").toString
        graft.sinks.IcebergLog.writeBatch(li.repartition(4), table)
        graft.sinks.IcebergLog.setTableProperties(s, table,
          Map("write.delete.mode" -> "merge-on-read"))
        graft.sinks.IcebergLog.deleteWhere(s, table, "l_quantity > 45")
        // → the v3 shape
        val m = graft.sinks.IcebergLog.current(table).get
        val snap = m.snapshots
          .find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
        val partType = StructType(Seq.empty[StructField])
        val v3Entry = StructType(Seq(
          StructField("status", IntegerType, nullable = false),
          StructField("snapshot_id", LongType, nullable = true),
          StructField("sequence_number", LongType, nullable = true),
          StructField("file_sequence_number", LongType, nullable = true),
          StructField("data_file", StructType(Seq(
            StructField("content", IntegerType, nullable = false),
            StructField("file_path", StringType, nullable = false),
            StructField("file_format", StringType, nullable = false),
            StructField("partition", StructType(Seq.empty), nullable = false),
            StructField("record_count", LongType, nullable = false),
            StructField("file_size_in_bytes", LongType, nullable = false),
            StructField("referenced_data_file", StringType, nullable = true),
            StructField("content_offset", LongType, nullable = true),
            StructField("content_size_in_bytes", LongType, nullable = true))),
            nullable = false)))
        graft.sinks.IcebergLog.readManifestList(snap.get("manifest-list").asText())
          .filter(_.getInt(3) == 1).foreach { mf =>
            val mfPath = java.nio.file.Paths.get(mf.getString(0))
            val entries = graft.sinks.IcebergLog.readEntries(mfPath.toString, partType)
            val delParquets = entries.map(_.getStruct(4).getString(1))
            val byRef = s.read
              .schema(StructType(Seq(StructField("file_path", StringType),
                StructField("pos", LongType))))
              .parquet(delParquets: _*).collect()
              .map(r => (r.getString(0), r.getLong(1)))
              .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toSeq.sortBy(_._1)
            val (puffin, at) = graft.formats.Puffin.writeDvFile(
              mfPath.getParent, byRef)
            val e0 = entries.head
            val rows = byRef.map { case (ref, ps) =>
              val (off, size) = at(ref)
              org.apache.spark.sql.Row(e0.get(0), e0.get(1), e0.get(2), e0.get(3),
                org.apache.spark.sql.Row(1, puffin.toAbsolutePath.toString,
                  "PUFFIN", org.apache.spark.sql.Row(), ps.size.toLong,
                  java.nio.file.Files.size(puffin), ref, off, size))
            }
            val tmp = java.nio.file.Files.createTempFile(mfPath.getParent, "v3", ".avro")
            val out = java.nio.file.Files.newOutputStream(tmp)
            try graft.formats.AvroCodec.writeOcf(out, v3Entry, rows.iterator)
            finally out.close()
            java.nio.file.Files.move(tmp, mfPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val mp = java.nio.file.Paths.get(table, "metadata",
          s"v${m.version}.metadata.json")
        val node = mapper.readTree(java.nio.file.Files.readAllBytes(mp))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        node.put("format-version", 3)
        java.nio.file.Files.write(mp, node.toString.getBytes("UTF-8"))
        graft.sinks.IcebergLog.read(s, table)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
              |FROM lineitem WHERE NOT (l_quantity > 45) GROUP BY 1""".stripMargin)),

    // ── iceberg v3 WRITE mode (r14): the table upgrades 2→3 through the
    //    public format-version property, then merge-on-read DELETE and
    //    UPDATE land puffin DELETION VECTORS natively (spec-compliant
    //    footers, fields 143-145 on the wire, one-DV-per-file supersede
    //    with prior-delete folding) and the read resolves them through
    //    the same v3 bitmap path q_iceberg_v3 exercises on the foreign
    //    shape. A hash match proves our OWN v3 writes round-trip the
    //    whole stack against an exact engine.
    Q("q_iceberg_v3_write",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-v3w").toString
        graft.sinks.IcebergLog.writeBatch(li.repartition(4), table)
        graft.sinks.IcebergLog.setTableProperties(s, table, Map(
          "format-version" -> "3",
          "write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "merge-on-read"))
        graft.sinks.IcebergLog.deleteWhere(s, table, "l_quantity > 45")
        // second DV wave on the same files: supersede + union in action
        graft.sinks.IcebergLog.updateWhere(s, table,
          Seq("l_quantity" -> "l_quantity * 2"),
          Some("l_returnflag = 'R'"))
        graft.sinks.IcebergLog.read(s, table)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
              |  ${oSum("CASE WHEN l_returnflag = 'R' THEN l_quantity * 2 ELSE l_quantity END")} AS sum_qty
              |FROM lineitem WHERE NOT (l_quantity > 45) GROUP BY 1""".stripMargin)),

    // ── merge-on-read DML on delta (r11, DELETION VECTORS — the public
    //    protocol 3/7 feature gated by delta.enableDeletionVectors): the
    //    q_delta_dml verbs, but the DELETE folds positions into roaring
    //    deletion vectors (nothing rewritten) and the UPDATE retracts by
    //    position + appends postimages. The read back resolves the DV'd
    //    files through the broadcast-bitmap filter and clean files
    //    through plain scans; the oracle replays the algebra, proving
    //    the bitmap wire format, the sidecar store, and the position
    //    filter end-to-end against an exact engine.
    Q("q_delta_dv",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-delta-dv").resolve("t").toString
        graft.sinks.DeltaLog.writeBatch(li, table,
          tableConf = Map("delta.enableDeletionVectors" -> "true"))
        graft.sinks.DeltaLog.deleteWhere(s, table, "l_quantity > 45")
        graft.sinks.DeltaLog.updateWhere(s, table,
          Seq("l_extendedprice" -> "l_extendedprice * 2"),
          Some("l_returnflag = 'R'"))
        graft.sinks.DeltaLog.read(s, table)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty,
              |  ${oSum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * 2 ELSE l_extendedprice END")} AS sum_price
              |FROM lineitem WHERE NOT (l_quantity > 45) GROUP BY 1""".stripMargin)),

    // ── merge-on-read DML (r11, the iceberg v2 row-delta path): the same
    //    verbs as q_iceberg_dml but under write.{delete,update}.mode =
    //    merge-on-read — the DELETE lands as position-delete files
    //    (nothing rewritten) and the UPDATE as retract + postimage
    //    append. The read back exercises the position anti-join on the
    //    delete-dirty files and plain scans on the clean ones; the oracle
    //    replays the algebra, so a hash match proves delete-file write,
    //    bounds-confined delete application, and postimage append
    //    end-to-end against an exact engine.
    Q("q_iceberg_mor",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-mor").resolve("t").toString
        graft.sinks.IcebergLog.writeBatch(li, table,
          partitionBy = Seq("l_returnflag"))
        graft.sinks.IcebergLog.setTableProperties(s, table, Map(
          "write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "merge-on-read"))
        graft.sinks.IcebergLog.deleteWhere(s, table, "l_quantity > 45")
        graft.sinks.IcebergLog.updateWhere(s, table,
          Seq("l_extendedprice" -> "l_extendedprice * 2"),
          Some("l_returnflag = 'R'"))
        graft.sinks.IcebergLog.read(s, table)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty,
              |  ${oSum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * 2 ELSE l_extendedprice END")} AS sum_price
              |FROM lineitem WHERE NOT (l_quantity > 45) GROUP BY 1""".stripMargin)),

    // ── MERGE INTO (copy-on-write upsert, r10): write orders into a
    //    fresh delta table, merge a CDC-shaped source (price corrections
    //    for every 10th order + brand-new negated-key orders), read back
    //    and aggregate. The oracle replays the same upsert as
    //    left-join ∪ anti-join algebra over the source parquet, so a
    //    hash match proves matched-update, not-matched-insert, the
    //    key-bounds file pruning, and the one-version swap end-to-end.
    Q("q_delta_merge",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-delta-merge").resolve("t").toString
        graft.sinks.DeltaLog.writeBatch(o, table)
        // the insert branch excludes key 0: -0 = 0 would collide with the
        // update branch's key 0 (two source rows for one target row = the
        // multiple-source-rows error, correctly)
        val source = o.filter(col("k") % 10 === 0)
          .select(col("k"), (col("p") + 1000d).as("p"))
          .unionAll(o.filter(col("k") % 3 === 0 && col("k") > 0)
            .select((-col("k")).as("k"), col("p")))
        graft.sinks.DeltaLog.merge(s, table, source,
          graft.sinks.Merge.Clauses("t", "s", "t.k = s.k",
            Seq(graft.sinks.Merge.MatchedClause(None, Left(Seq("p" -> "s.p")))),
            Some((None, Seq.empty))))
        graft.sinks.DeltaLog.read(s, table)
          .groupBy((col("k") < 0).as("inserted"))
          .agg(count(lit(1)).as("n"), dsum(col("p")).as("sum_p"))
      },
      Some(s"""WITH t AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
              |src AS (SELECT o_orderkey AS k, o_totalprice + 1000 AS p FROM orders WHERE o_orderkey % 10 = 0
              |        UNION ALL
              |        SELECT -o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey > 0),
              |merged AS (SELECT t.k, COALESCE(src.p, t.p) AS p
              |           FROM t LEFT JOIN src ON t.k = src.k
              |           UNION ALL
              |           SELECT src.k, src.p FROM src
              |           WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.k = src.k))
              |SELECT k < 0 AS inserted, COUNT(*) AS n, ${oSum("p")} AS sum_p
              |FROM merged GROUP BY 1""".stripMargin)),

    // ── zero-read equality upsert (r11, iceberg v2 equality deletes +
    //    the public write.upsert.enabled property): the same CDC batch
    //    as q_delta_merge lands as ONE equality-delete file + appends —
    //    the target is never read — and the read back resolves
    //    last-writer-wins through the v2 sequence rule (the commit's own
    //    appends are exempt; older versions of the keys anti-join away).
    //    Same oracle algebra: a hash match proves eq-delete write, the
    //    seq-scoped equality anti-join, and key-bounds file skipping.
    Q("q_iceberg_upsert",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-upsert").resolve("t").toString
        graft.sinks.Merge.upsertBatch(s, "iceberg", table, o, Seq("k"))
        graft.sinks.IcebergLog.setTableProperties(s, table,
          Map("write.upsert.enabled" -> "true"))
        val cdc = o.filter(col("k") % 10 === 0)
          .select(col("k"), (col("p") + 1000d).as("p"))
          .unionAll(o.filter(col("k") % 3 === 0 && col("k") > 0)
            .select((-col("k")).as("k"), col("p")))
        graft.sinks.Merge.upsertBatch(s, "iceberg", table, cdc, Seq("k"),
          orderBy = Some("p"))
        graft.sinks.IcebergLog.read(s, table)
          .groupBy((col("k") < 0).as("inserted"))
          .agg(count(lit(1)).as("n"), dsum(col("p")).as("sum_p"))
      },
      Some(s"""WITH t AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
              |src AS (SELECT o_orderkey AS k, o_totalprice + 1000 AS p FROM orders WHERE o_orderkey % 10 = 0
              |        UNION ALL
              |        SELECT -o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey > 0),
              |merged AS (SELECT t.k, COALESCE(src.p, t.p) AS p
              |           FROM t LEFT JOIN src ON t.k = src.k
              |           UNION ALL
              |           SELECT src.k, src.p FROM src
              |           WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.k = src.k))
              |SELECT k < 0 AS inserted, COUNT(*) AS n, ${oSum("p")} AS sum_p
              |FROM merged GROUP BY 1""".stripMargin)),

    // ── MERGE-backed upsert sink (r10): bootstrap a delta table from
    //    orders, then land a CDC batch carrying TWO versions of every
    //    7th key (merge_order_by keeps the newest) — the final state is
    //    deterministic algebra the oracle computes directly, so a hash
    //    match proves the bootstrap, the last-wins dedupe, and the
    //    in-place update path end-to-end.
    Q("q_delta_upsert",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"),
            lit(0L).as("ver"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-delta-upsert").resolve("t").toString
        graft.sinks.Merge.upsertBatch(s, "delta", table, o, Seq("k"))
        val cdc = o.filter(col("k") % 7 === 0)
          .select(col("k"), (col("p") + 100d).as("p"), lit(1L).as("ver"))
          .unionAll(o.filter(col("k") % 7 === 0)
            .select(col("k"), (col("p") + 200d).as("p"), lit(2L).as("ver")))
        graft.sinks.Merge.upsertBatch(s, "delta", table, cdc, Seq("k"),
          orderBy = Some("ver"))
        graft.sinks.DeltaLog.read(s, table)
          .groupBy((col("k") % 7 === 0).as("touched"))
          .agg(count(lit(1)).as("n"), dsum(col("p")).as("sum_p"),
            sum(col("ver")).as("sum_ver"))
      },
      Some(s"""SELECT o_orderkey % 7 = 0 AS touched, COUNT(*) AS n,
              |  ${oSum("CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 200 ELSE o_totalprice END")} AS sum_p,
              |  CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 2 ELSE 0 END) AS BIGINT) AS sum_ver
              |FROM orders GROUP BY 1""".stripMargin)),

    // ── CHANGE DATA FEED (r11): with delta.enableChangeDataFeed set,
    //    DELETE/UPDATE record their change rows (_change_data files + cdc
    //    actions) and readChanges replays them. The oracle recomputes the
    //    change sets algebraically from the source parquet, so a hash
    //    match proves the recorded images (delete rows, update pre/post
    //    pairs) — the contract downstream updating streams consume.
    Q("q_delta_cdf",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-delta-cdf").resolve("t").toString
        graft.sinks.DeltaLog.writeBatch(li, table,
          tableConf = Map(graft.sinks.Cdf.enableProp -> "true"))
        graft.sinks.DeltaLog.deleteWhere(s, table, "l_quantity > 45")
        graft.sinks.DeltaLog.updateWhere(s, table,
          Seq("l_extendedprice" -> "l_extendedprice * 2"),
          Some("l_returnflag = 'R'"))
        graft.sinks.DeltaLog.readChanges(s, table, 1L)
          .groupBy(col("_change_type"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
      },
      Some(s"""SELECT 'delete' AS _change_type, COUNT(*) AS n,
              |  ${oSum("l_quantity")} AS sum_qty, ${oSum("l_extendedprice")} AS sum_price
              |FROM lineitem WHERE l_quantity > 45
              |UNION ALL
              |SELECT 'update_preimage', COUNT(*), ${oSum("l_quantity")},
              |  ${oSum("l_extendedprice")}
              |FROM lineitem WHERE NOT (l_quantity > 45) AND l_returnflag = 'R'
              |UNION ALL
              |SELECT 'update_postimage', COUNT(*), ${oSum("l_quantity")},
              |  ${oSum("l_extendedprice * 2")}
              |FROM lineitem WHERE NOT (l_quantity > 45) AND l_returnflag = 'R'""".stripMargin)),

    // ── the iceberg changelog twin: the manifest-diff changelog emits the
    //    DELETE's net change at FILE granularity (removed files retract,
    //    surviving rows re-insert), so the verified quantity is the NET
    //    per-key change — retract minus re-insert — which equals the
    //    deleted rows exactly; the oracle computes that set directly.
    Q("q_iceberg_cdf",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
        val table = java.nio.file.Files
          .createTempDirectory("graft-iceberg-cdf").resolve("t").toString
        graft.sinks.IcebergLog.writeBatch(li, table,
          partitionBy = Seq("l_returnflag"))
        graft.sinks.IcebergLog.deleteWhere(s, table, "l_quantity > 45")
        // net change per row image: +1 for insert, -1 for delete; carried
        // survivors cancel, leaving exactly the deleted rows at weight -1
        graft.sinks.IcebergLog.readChanges(s, table, 2L)
          .withColumn("w", when(col("_change_type") === "delete", -1L).otherwise(1L))
          .groupBy(col("l_returnflag"))
          .agg(sum(col("w")).as("net_rows"),
            dsum(col("l_quantity") * col("w")).as("net_qty"))
          .filter(col("net_rows") =!= 0)
      },
      Some(s"""SELECT l_returnflag, CAST(-COUNT(*) AS BIGINT) AS net_rows,
              |  ${oSum("-l_quantity")} AS net_qty
              |FROM lineitem WHERE l_quantity > 45 GROUP BY 1""".stripMargin))
  )
}
