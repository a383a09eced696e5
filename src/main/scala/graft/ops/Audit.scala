package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** q64: declarative data-quality audit (the Deequ-style check suite a
  * lakehouse runs before promoting a batch): per-table constraint
  * checks evaluated in ONE conditional-aggregation pass per table,
  * plus referential checks as anti-join counts and a key-uniqueness
  * check as a group-count. Output is the audit report — one row per
  * check with its violation count and pass flag.
  *
  * Scale shape: the per-table rule groups share a single scan each
  * (conditional sums, no per-rule passes); the orphan checks are the
  * only shuffles and broadcast their dimension side when it fits. A
  * 100 TB audit is therefore ~one pass over each fact table.
  */
object Audit {

  def q64QualityAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val cust = Tables.load(spark, dir, "customer")

    def cnt(pred: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))

    // one scan for all lineitem rules, one for all customer rules
    val liChecks = li.agg(
      cnt(col("l_discount") > 0.08).as("lineitem_discount_gt_8pct"),
      cnt(col("l_quantity") <= 0).as("lineitem_nonpositive_qty"),
      cnt(col("l_extendedprice") <= 0).as("lineitem_nonpositive_price"))
    val custChecks = cust.agg(
      cnt(col("c_acctbal") < 0).as("customer_negative_balance"))
    val orderChecks = orders.agg(
      cnt(col("o_totalprice") <= 0).as("orders_nonpositive_total"))
    val dupPk = orders.groupBy(col("o_orderkey")).count()
      .filter(col("count") > 1)
      .agg(count(lit(1)).as("orders_pk_duplicates"))
    val liOrphan = li
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("lineitem_orphan_orders"))
    val custOrphan = orders
      // customer keys grow with SF — no fixed hint; the anti-join
      // auto-broadcasts from size stats while the key set fits
      .join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orders_orphan_customers"))

    // melt each rule-group frame ONCE (explode over its columns), so a
    // table's rules really do share a single scan in the physical plan
    // — selecting each rule column separately would re-run the agg per
    // rule
    def melt(f: DataFrame): DataFrame = {
      val names = f.columns.toSeq
      f.select(explode(array(names.map(n =>
        struct(lit(n).as("check_name"), col(n).cast("long").as("violations"))): _*))
        .as("kv"))
        .select(col("kv.check_name"), col("kv.violations"))
    }
    Seq(liChecks, custChecks, orderChecks, dupPk, liOrphan, custOrphan)
      .map(melt)
      .reduce(_ union _)
      .withColumn("passed", col("violations") === 0L)
  }

  /** Interpolated per-group median of `valCol` (any numeric), via the
    * same order-statistics pattern as q69: rank per group (the
    * two-phase distributed [[Rank.groupRank]] — event_type has ~5
    * values, so a plain per-group window would sort a fifth of the
    * table in ONE task), pick the ⌊(n−1)/2⌋ and ⌈(n−1)/2⌉ neighbors,
    * average — (lo + hi) / 2.0 is one shared expression, so both
    * engines produce the same bits. The two middle ranks filter down
    * to ≤2 rows per group, and (min + max) / 2.0 IS (lo + hi) / 2.0
    * since ranks are value-sorted. */
  private def medianOf(df: DataFrame, grp: String, valCol: String,
      out: String): DataFrame = {
    Rank.groupRank(df.select(col(grp), col(valCol)),
        Seq(grp), valCol, Nil, "_rn", "_n")
      .filter(col("_rn") === floor((col("_n") - 1) / 2.0).cast("long") ||
        col("_rn") === ceil((col("_n") - 1) / 2.0).cast("long"))
      .groupBy(col(grp))
      .agg(((min(col(valCol)) + max(col(valCol))) / 2.0).as(out))
  }

  /** q70: robust outlier detection — per event type, the median and
    * median-absolute-deviation of `value`, and the count of events
    * outside median ± 5·MAD. MAD-based flags survive the outliers
    * themselves (a mean/stddev rule is dragged by the very anomalies
    * it is meant to catch). All order statistics run over exact
    * integer value units with dyadic interpolation, so the doubles —
    * and therefore the outlier COMPARISON at the threshold boundary —
    * are bit-identical across engines. The 5·MAD rational threshold is
    * deliberate (the usual 1.4826 normal-consistency constant is not
    * exactly representable; a data-quality gate only needs a stable,
    * documented cutoff). Two distributed rank passes + two broadcast
    * joins of the 5-row median frames. */
  def q70OutlierStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), Exact.units(col("value"), 2).as("u"))
    val med = medianOf(ev, "event_type", "u", "mu")
    val withDev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("u") - col("mu")))
    val mad = medianOf(withDev, "event_type", "dev", "mad")
    withDev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        (min(col("mu")) / 100.0).as("median_value"),
        (min(col("mad")) / 100.0).as("mad_value"),
        coalesce(sum(when(col("dev") > col("mad") * 5.0, 1L).otherwise(0L)),
          lit(0L)).as("n_outliers"),
        count(lit(1)).as("n_events"))
  }

  val q70Oracle: String =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS u FROM events
      |), n1 AS (
      |  SELECT event_type, count(*) AS n FROM e GROUP BY 1
      |), r1 AS (
      |  SELECT event_type, u,
      |    row_number() OVER (PARTITION BY event_type ORDER BY u ASC) - 1 AS rn
      |  FROM e
      |), m1 AS (
      |  SELECT n1.event_type, (l.u + h.u) / 2.0 AS mu
      |  FROM n1
      |  JOIN r1 l ON l.event_type = n1.event_type
      |    AND l.rn = CAST(floor((n1.n - 1) / 2.0) AS BIGINT)
      |  JOIN r1 h ON h.event_type = n1.event_type
      |    AND h.rn = CAST(ceil((n1.n - 1) / 2.0) AS BIGINT)
      |), d AS (
      |  SELECT e.event_type, e.u, m1.mu, abs(e.u - m1.mu) AS dev
      |  FROM e JOIN m1 ON m1.event_type = e.event_type
      |), r2 AS (
      |  SELECT event_type, dev,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dev ASC) - 1 AS rn
      |  FROM d
      |), m2 AS (
      |  SELECT n1.event_type, (l.dev + h.dev) / 2.0 AS mad
      |  FROM n1
      |  JOIN r2 l ON l.event_type = n1.event_type
      |    AND l.rn = CAST(floor((n1.n - 1) / 2.0) AS BIGINT)
      |  JOIN r2 h ON h.event_type = n1.event_type
      |    AND h.rn = CAST(ceil((n1.n - 1) / 2.0) AS BIGINT))
      |SELECT d.event_type,
      |  min(d.mu) / 100.0 AS median_value,
      |  min(m2.mad) / 100.0 AS mad_value,
      |  CAST(sum(CASE WHEN d.dev > m2.mad * 5.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers,
      |  count(*) AS n_events
      |FROM d JOIN m2 ON m2.event_type = d.event_type
      |GROUP BY 1""".stripMargin

  /** q72: Pearson correlation matrix over lineitem's fixed-point
    * numeric columns — the statistical profiling pass a data catalog
    * runs per table. Naive corr() is order-dependent (sums of double
    * products drift by partition order) and the two engines' built-ins
    * differ anyway, so every moment (Σx, Σxy, Σx², n) accumulates as
    * EXACT Decimal(38,0) over scaled integer units — associative, any
    * shuffle order — and only then converts to double for ONE shared
    * closed-form formula; both engines round the exact integers to the
    * same nearest doubles, so r is bit-identical. One scan computes
    * all 14 moments; the matrix itself is a 6-row projection. */
  private val CorrCols = Seq(
    "q" -> "l_quantity", "p" -> "l_extendedprice",
    "d" -> "l_discount", "t" -> "l_tax")

  def q72CorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val li = Tables.load(spark, dir, "lineitem").select(
      CorrCols.map { case (a, c) => Exact.units(col(c), 2).as(a) }: _*)
    // moments stay DECIMAL through n·Σxy − ΣxΣy: a double-space
    // subtract-of-products differs across engines in last ulps
    // (contraction/ordering); only the three final terms become
    // doubles, and sqrt/ * / / are IEEE correctly-rounded on both
    val moments =
      Seq(count(lit(1)).cast(dec).as("n")) ++
        CorrCols.map { case (a, _) =>
          sum(col(a).cast(dec)).as(s"s_$a") } ++
        (for ((a, _) <- CorrCols; (b, _) <- CorrCols if a <= b)
          yield sum((col(a).cast(dec) * col(b).cast(dec))).as(s"s_$a$b"))
    val aggRow = li.agg(moments.head, moments.tail: _*)
    def rFor(a: String, b: String) = {
      val (n, sa, sb) = (col("n"), col(s"s_$a"), col(s"s_$b"))
      val (saa, sbb) = (col(s"s_$a$a"), col(s"s_$b$b"))
      val sab = col(s"s_$a$b")
      (n * sab - sa * sb).cast("double") /
        (sqrt((n * saa - sa * sa).cast("double")) *
          sqrt((n * sbb - sb * sb).cast("double")))
    }
    val pairs = for ((a, ca) <- CorrCols; (b, cb) <- CorrCols if a < b)
      yield struct(lit(ca).as("col_a"), lit(cb).as("col_b"),
        rFor(a, b).as("pearson_r"))
    aggRow
      .select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.col_a"), col("kv.col_b"), col("kv.pearson_r"))
  }

  val q72Oracle: String = {
    val moments =
      Seq("count(*) AS n") ++
        CorrCols.map { case (a, c) =>
          s"sum(CAST(round($c * 100.0) AS BIGINT)) AS s_$a" } ++
        (for ((a, ca) <- CorrCols; (b, cb) <- CorrCols if a <= b)
          yield s"sum(CAST(round($ca * 100.0) AS BIGINT) * " +
            s"CAST(round($cb * 100.0) AS BIGINT)) AS s_$a$b")
    val rows = (for ((a, ca) <- CorrCols; (b, cb) <- CorrCols if a < b)
      yield s"""SELECT '$ca' AS col_a, '$cb' AS col_b,
               |  CAST(n * s_$a$b - s_$a * s_$b AS DOUBLE) /
               |  (sqrt(CAST(n * s_$a$a - s_$a * s_$a AS DOUBLE)) *
               |   sqrt(CAST(n * s_$b$b - s_$b * s_$b AS DOUBLE)))
               |  AS pearson_r FROM m""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH m AS (
       |  SELECT ${moments.mkString(",\n    ")}
       |  FROM lineitem)
       |$rows""".stripMargin
  }

  val q64Oracle: String =
    """WITH checks AS (
      |  SELECT 'lineitem_discount_gt_8pct' AS check_name,
      |    (SELECT count(*) FROM lineitem WHERE l_discount > 0.08) AS violations
      |  UNION ALL SELECT 'lineitem_nonpositive_qty',
      |    (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
      |  UNION ALL SELECT 'lineitem_nonpositive_price',
      |    (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)
      |  UNION ALL SELECT 'customer_negative_balance',
      |    (SELECT count(*) FROM customer WHERE c_acctbal < 0)
      |  UNION ALL SELECT 'orders_nonpositive_total',
      |    (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
      |  UNION ALL SELECT 'orders_pk_duplicates',
      |    (SELECT count(*) FROM (SELECT o_orderkey FROM orders
      |                           GROUP BY 1 HAVING count(*) > 1) d)
      |  UNION ALL SELECT 'lineitem_orphan_orders',
      |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL SELECT 'orders_orphan_customers',
      |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)))
      |SELECT check_name, CAST(violations AS BIGINT) AS violations,
      |  violations = 0 AS passed
      |FROM checks""".stripMargin

  /** q82: histogram-sketch quantiles — the SCALE-PATH complement to
    * q69's exact order statistics. q69's exact path must move every
    * group's values through a rank computation; this one never sorts
    * data at all: pass 1 computes per-group (min, max, n), pass 2 bins
    * every value into 64 equi-width buckets (a map-side-combinable
    * count aggregation — the only exchange carries ≤ 64 rows per group
    * per partition), and the quantile is read off the cumulative
    * histogram with linear interpolation inside the landing bin.
    * Fixed 64-cell state per group at any corpus size — the same
    * sketch-vs-exact trade as q80-vs-exact counts.
    *
    * Determinism: binning and interpolation are pure double arithmetic
    * with one association order, written identically in both engines
    * (width = (mx−mn)/64; est = mn + width·(bin + frac)); bin counts
    * and cumulative sums are integers. The only window runs over the
    * ≤ 64-row-per-group HISTOGRAM, not the data. */
  val HistBins = 64

  def q82HistQuantile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val stats = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("mn"), max(col("value")).as("mx"),
        count(lit(1)).as("n"))
    val width = (col("mx") - col("mn")) / lit(HistBins)
    val hist = ev.join(broadcast(stats), "event_type")
      .select(col("event_type"),
        when(col("mx") === col("mn"), lit(0))
          .otherwise(least(lit(HistBins - 1),
            floor((col("value") - col("mn")) / width).cast("int")))
          .as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    // cumulative counts over the ≤64-row histogram (aggregate-sized)
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("event_type"))
        .orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val targets = stats.select(col("event_type"), col("mn"), col("mx"), col("n"),
      explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
      .withColumn("target", col("p") * col("n"))
    val landed = cum.join(targets, "event_type")
      .filter(col("cum") >= col("target"))
      .groupBy(col("event_type"), col("p"), col("mn"), col("mx"), col("n"),
        col("target"))
      .agg(min(struct(col("bin"), col("cum"), col("cnt"))).as("lb"))
    landed.select(col("event_type"), col("p"),
      (col("mn") + ((col("mx") - col("mn")) / lit(HistBins)) *
        (col("lb.bin").cast("double") +
          (col("target") - (col("lb.cum") - col("lb.cnt")).cast("double")) /
            col("lb.cnt").cast("double"))).as("est_value"),
      col("n"))
  }

  val q82Oracle: String =
    s"""WITH ev AS (
       |  SELECT event_type, value FROM events
       |), stats AS (
       |  SELECT event_type, min(value) AS mn, max(value) AS mx,
       |    count(*) AS n
       |  FROM ev GROUP BY 1
       |), hist AS (
       |  SELECT event_type, bin, count(*) AS cnt FROM (
       |    SELECT ev.event_type,
       |      CASE WHEN s.mx = s.mn THEN 0
       |        ELSE least(${HistBins - 1}, CAST(floor((ev.value - s.mn) /
       |          ((s.mx - s.mn) / $HistBins)) AS INT)) END AS bin
       |    FROM ev JOIN stats s USING (event_type)) t
       |  GROUP BY 1, 2
       |), cum AS (
       |  SELECT event_type, bin, cnt,
       |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
       |                   ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM hist
       |), targets AS (
       |  SELECT event_type, mn, mx, n, p, p * n AS target
       |  -- DuckDB literal 0.5 is DECIMAL; cast so p*n is the same
       |  -- double product Spark computes
       |  FROM stats,
       |    (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p) ps
       |), landed AS (
       |  SELECT event_type, p, mn, mx, n, target,
       |    min(bin) AS bin
       |  FROM cum JOIN targets USING (event_type)
       |  WHERE cum >= target
       |  GROUP BY 1, 2, 3, 4, 5, 6
       |)
       |SELECT l.event_type, l.p,
       |  l.mn + ((l.mx - l.mn) / $HistBins) *
       |    (CAST(l.bin AS DOUBLE) +
       |     (l.target - CAST(c.cum - c.cnt AS DOUBLE)) / CAST(c.cnt AS DOUBLE))
       |  AS est_value,
       |  l.n
       |FROM landed l
       |JOIN cum c ON c.event_type = l.event_type AND c.bin = l.bin""".stripMargin

  /** q96: per-group OLS regression — slope/intercept of event value
    * (cents) against hour-of-day per event type, via the q72 exact
    * moment discipline: n, Σx, Σy, Σx², Σxy accumulate as
    * Decimal(38,0) integers (associative — any shuffle order yields
    * the same bits; a double-space n·Σxy − Σx·Σy contracts differently
    * across engines), then ONE shared closed-form in doubles. The
    * regression-over-moments trick is what makes per-group model
    * fitting a single map-side-combinable aggregation pass — the same
    * plan class as q1 at any scale, no per-group data movement beyond
    * the combined partials.
    *
    * Contract (ties q72): slope denominator n·Σx² − (Σx)² > 0, i.e.
    * every group sees ≥ 2 distinct hours — true for any realistic
    * event feed and asserted by the oracle producing finite values. */
  def q96GroupRegression(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val ev = Tables.load(spark, dir, "events").select(
      col("event_type"),
      hour(col("ts")).cast("long").as("x"),
      Exact.units(col("value"), 2).as("y"))
    val slope =
      (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("x").cast(dec) * col("y").cast(dec))).as("sxy"))
      .select(col("event_type"), col("n").cast("long").as("n_events"),
        slope.as("slope_cents_per_hour"),
        ((col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("n").cast("double")).as("intercept_cents"))
  }

  val q96Oracle: String = {
    val slope = "CAST(n * sxy - sx * sy AS DOUBLE) / " +
      "CAST(n * sxx - sx * sx AS DOUBLE)"
    s"""SELECT event_type, CAST(n AS BIGINT) AS n_events,
       |  $slope AS slope_cents_per_hour,
       |  (CAST(sy AS DOUBLE) - ($slope) * CAST(sx AS DOUBLE))
       |    / CAST(n AS DOUBLE) AS intercept_cents
       |FROM (
       |  SELECT event_type, count(*) AS n,
       |    sum(hour(ts)) AS sx,
       |    sum(CAST(round(value * 100.0) AS BIGINT)) AS sy,
       |    sum(hour(ts) * hour(ts)) AS sxx,
       |    sum(hour(ts) * CAST(round(value * 100.0) AS BIGINT)) AS sxy
       |  FROM events GROUP BY 1) m""".stripMargin
  }

  /** q98: Benford first-digit audit — the classic fabricated-data
    * screen: the leading significant digit of every order total,
    * counted and expressed as an integer permille share. The digit is
    * extracted from the INTEGER cent string (cents share the leading
    * significant digit with the price, and integer-to-string is
    * dialect-stable where double formatting is not). One scan + a
    * 9-row aggregate; the total joins back as a 1-row broadcast. A
    * genuine Benford test would compare against log10(1+1/d) — left to
    * the consumer, because log10 is exactly the libm-divergent
    * function the oracle discipline bans (the q30 lesson). */
  def q98BenfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val digit = substring(
      expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").cast("string"), 1, 1)
    val counts = orders.groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val total = orders.select(count(lit(1)).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000 div n_total").as("permille"))
  }

  val q98Oracle: String =
    """SELECT substring(CAST(CAST(round(o_totalprice * 100.0) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS digit,
      |  count(*) AS n,
      |  CAST(count(*) * 1000 // (SELECT count(*) FROM orders) AS BIGINT)
      |    AS permille
      |FROM orders GROUP BY 1""".stripMargin

  /** q100: table profiler — the ANALYZE-stats pass a warehouse runs
    * before query planning: per profiled column, row count, null count
    * and exact distinct count, emitted as one long-format report. Per
    * table the plan is a single scan feeding a multi-count-distinct
    * aggregate (Catalyst's Expand strategy: one pass, rows × profiled
    * columns), so profiling cost is one scan per table at any scale —
    * the integers hash-compare exactly, unlike min/max which would
    * drag dialect-specific value formatting into the report. */
  private val ProfileCols: Seq[(String, Seq[String])] = Seq(
    "lineitem" -> Seq("l_orderkey", "l_returnflag", "l_linestatus"),
    "orders" -> Seq("o_custkey", "o_orderstatus", "o_orderpriority"),
    "customer" -> Seq("c_nationkey", "c_mktsegment"),
    "documents" -> Seq("source", "lang"),
    "events" -> Seq("user_id", "event_type"))

  def q100TableProfile(spark: SparkSession, dir: String): DataFrame =
    ProfileCols.map { case (t, cols) =>
      val df = Tables.load(spark, dir, t)
      val aggs =
        Seq(count(lit(1)).as("_rows")) ++
          cols.flatMap(c => Seq(
            sum(col(c).isNull.cast("long")).as(s"_nulls_$c"),
            countDistinct(col(c)).as(s"_ndv_$c")))
      val row = df.agg(aggs.head, aggs.tail: _*)
      val entries = cols.map(c => struct(lit(c).as("column_name"),
        col("_rows").as("n_rows"), col(s"_nulls_$c").as("n_nulls"),
        col(s"_ndv_$c").as("n_distinct")))
      row.select(lit(t).as("table_name"), explode(array(entries: _*)).as("e"))
        .select(col("table_name"), col("e.column_name"), col("e.n_rows"),
          col("e.n_nulls"), col("e.n_distinct"))
    }.reduce(_ union _)

  val q100Oracle: String =
    ProfileCols.flatMap { case (t, cols) =>
      cols.map(c =>
        s"""SELECT '$t' AS table_name, '$c' AS column_name,
           |  count(*) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct
           |FROM $t""".stripMargin)
    }.mkString("\nUNION ALL\n")

  /** q109: per-group MULTIVARIATE OLS — two features solved in closed
    * form, extending q96's single-feature fit to the normal equations.
    * Model: order total (cents) ~ b0 + b1·(total quantity) +
    * b2·(line count), fitted per order priority.
    *
    * Same exact-moment discipline as q96/q72: the nine sufficient
    * statistics (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y)
    * accumulate as Decimal(38,0) integers — associative, so any
    * partitioning yields the same bits — and the 2×2 Cramer solve on
    * the centered scatter matrix stays in integer space up to the
    * final divisions:
    *   S11 = n·Σx1²−(Σx1)²   S12 = n·Σx1x2−Σx1·Σx2   (≈1e13 at sf0.1)
    *   den = S11·S22 − S12²                          (≈1e24, fits 38)
    *   b1  = (S1y·S22 − S2y·S12) / den               (numerator ≈1e29)
    * Both engines then evaluate the IDENTICAL double expressions over
    * identical integers, so the quotients are bit-equal. The plan is
    * one lineitem aggregation, one co-partitioned orders join, and a
    * 5-row map-combinable aggregate — model fitting at the price of
    * q1 at any scale. Contract: den > 0 per group (features not
    * collinear — quantity and line count separate for any real feed;
    * the oracle yielding finite slopes asserts it). */
  def q109MultiRegression(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val feats = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("x1"),
        count(lit(1)).as("x2"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        Exact.units(col("o_totalprice"), 2).as("y"))
    val m = o.join(feats, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x1").cast(dec)).as("s1"),
        sum(col("x2").cast(dec)).as("s2"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x1") * col("x1")).cast(dec)).as("s11"),
        sum((col("x2") * col("x2")).cast(dec)).as("s22"),
        sum((col("x1") * col("x2")).cast(dec)).as("s12"),
        sum(col("x1").cast(dec) * col("y").cast(dec)).as("s1y"),
        sum(col("x2").cast(dec) * col("y").cast(dec)).as("s2y"))
    val sS11 = col("n") * col("s11") - col("s1") * col("s1")
    val sS22 = col("n") * col("s22") - col("s2") * col("s2")
    val sS12 = col("n") * col("s12") - col("s1") * col("s2")
    val sS1y = col("n") * col("s1y") - col("s1") * col("sy")
    val sS2y = col("n") * col("s2y") - col("s2") * col("sy")
    val den = sS11 * sS22 - sS12 * sS12
    val b1 = (sS1y * sS22 - sS2y * sS12).cast("double") / den.cast("double")
    val b2 = (sS2y * sS11 - sS1y * sS12).cast("double") / den.cast("double")
    m.select(col("o_orderpriority"), col("n").cast("long").as("n_orders"),
      b1.as("slope_qty"), b2.as("slope_lines"),
      ((col("sy").cast("double") - b1 * col("s1").cast("double") -
        b2 * col("s2").cast("double")) / col("n").cast("double"))
        .as("intercept_cents"))
  }

  val q109Oracle: String = {
    val S11 = "(n * s11 - s1 * s1)"
    val S22 = "(n * s22 - s2 * s2)"
    val S12 = "(n * s12 - s1 * s2)"
    val S1y = "(n * s1y - s1 * sy)"
    val S2y = "(n * s2y - s2 * sy)"
    val den = s"($S11 * $S22 - $S12 * $S12)"
    val b1 = s"(CAST($S1y * $S22 - $S2y * $S12 AS DOUBLE) / CAST($den AS DOUBLE))"
    val b2 = s"(CAST($S2y * $S11 - $S1y * $S12 AS DOUBLE) / CAST($den AS DOUBLE))"
    s"""WITH f AS (
       |  SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS x1,
       |    count(*) AS x2
       |  FROM lineitem GROUP BY 1
       |), j AS (
       |  SELECT o.o_orderpriority, f.x1, f.x2,
       |    CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS y
       |  FROM orders o JOIN f ON o.o_orderkey = f.l_orderkey
       |), m AS (
       |  SELECT o_orderpriority, count(*) AS n,
       |    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
       |    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
       |    sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
       |  FROM j GROUP BY 1)
       |SELECT o_orderpriority, CAST(n AS BIGINT) AS n_orders,
       |  $b1 AS slope_qty, $b2 AS slope_lines,
       |  (CAST(sy AS DOUBLE) - $b1 * CAST(s1 AS DOUBLE) -
       |   $b2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_cents
       |FROM m""".stripMargin
  }

  /** q129: 10 %-trimmed mean of event value per event type — the
    * robust location estimate that q70's MAD-based outlier stats
    * complement (trimming beats winsorizing when the tail is junk,
    * e.g. bot traffic). The per-group rank comes from
    * [[Rank.groupRank]]'s bucketed two-phase plan (no per-type
    * single-task sort); the kept slice [k, n−k) with k = n div 10 is
    * then one exact integer aggregate: cents sums and an integer-div
    * mean, truncation documented (values are non-negative, so Spark's
    * truncating div equals DuckDB's floor //). */
  def q129TrimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        col("value"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
    Rank.groupRank(ev, Seq("event_type"), "value", Seq("event_id"),
        "rk", "n")
      .where(col("rk") >= expr("n div 10") &&
        col("rk") < col("n") - expr("n div 10"))
      .groupBy(col("event_type"))
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n_kept"))
      .withColumn("trimmed_mean_cents", expr("sum_cents div n_kept"))
      .select(col("event_type"), col("n_kept"), col("sum_cents"),
        col("trimmed_mean_cents"))
  }

  val q129Oracle: String =
    """WITH v AS (
      |  SELECT event_type,
      |    CAST(round(value * 100.0) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value ASC, event_id ASC) - 1 AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  CAST(sum(cents) // count(*) AS BIGINT) AS trimmed_mean_cents
      |FROM v WHERE rk >= n // 10 AND rk < n - n // 10
      |GROUP BY event_type""".stripMargin

  /** q135: seasonal anomaly flags over daily revenue — the drift/
    * incident detector a training-data pipeline runs on its ingest
    * volumes. Each (event_type, day) daily total is compared against
    * the day-of-week population of its own event type (weekday
    * seasonality is the dominant cycle in clickstream revenue), and
    * flagged when it sits more than 3σ from the day-of-week mean.
    *
    * The 3σ test runs entirely in exact integer algebra — no sqrt, no
    * division: |x − μ| > 3σ  ⟺  (x·n − s)² > 9·(n·ss − s²) with
    * s = Σx, ss = Σx² over the n same-dow days, all in Decimal(38,0)
    * (the squares overflow int64 at large daily totals; DuckDB mirrors
    * in HUGEINT). Population stats INCLUDE the tested day (leave-one-
    * out would shift both sides; documented choice, same on both
    * engines).
    *
    * Scale shape: the corpus-sized work is one partial-aggregatable
    * daily-cents pass; everything after operates on the calendar-
    * bounded daily frame (|types| × |days| rows), with the per-(type,
    * dow) moments joined back by key. The dow key is the portable
    * `epoch_days % 7` (Spark and DuckDB number weekdays differently).
    */
  def q135AnomalyDays(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100.0) AS BIGINT)")).as("cents"))
      .withColumn("dow",
        (datediff(col("day"), to_date(lit("1970-01-01"))) % 7).cast("long"))
    val stats = daily.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).as("s"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")).as("ss"))
    daily.join(stats, Seq("event_type", "dow"))
      .withColumn("dev", expr(
        "CAST(cents AS DECIMAL(38,0)) * n - CAST(s AS DECIMAL(38,0))"))
      .withColumn("is_anomaly", expr(
        """dev * dev > 9 * (CAST(n AS DECIMAL(38,0)) * ss
          |  - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))"""
          .stripMargin))
      .select(col("event_type"), col("day"), col("cents"), col("dow"),
        col("is_anomaly"))
  }

  /** q142: CUSUM changepoint localization per event type — q135 flags
    * WHICH days are anomalous; this finds WHERE the level shifted: the
    * day maximizing |Σ_{j≤i}(x_j − μ)| over the daily revenue series,
    * the classic CUSUM estimator for a single mean changepoint.
    *
    * Exactness: with P_i the prefix sum, i the day index, S/n the
    * total/count, n·CUSUM_i = n·P_i − i·S is INTEGER — scaling by n
    * preserves the argmax, so no rational mean is ever materialized.
    * Computed in Decimal(38,0)/HUGEINT; the argmax is a struct-max
    * hash aggregate over (|n·CUSUM|, −epoch_day) (ties → earliest
    * day), not a ranking window.
    *
    * Scale shape: the corpus-sized pass is the partial-aggregatable
    * daily sum; the prefix window runs per event type over the
    * CALENDAR-BOUNDED daily frame (≤ |days| rows per group — the q131
    * precedent), and the per-type totals ride a broadcast join. */
  def q142Changepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100.0) AS BIGINT)")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("s"))
    daily
      .withColumn("p", sum(col("cents")).over(w))
      .withColumn("i", row_number().over(w).cast("long"))
      .join(broadcast(tot), Seq("event_type"))
      .withColumn("ncusum", expr(
        "CAST(n_days AS DECIMAL(38,0)) * p - CAST(i AS DECIMAL(38,0)) * s"))
      .withColumn("abs_nc", expr("CAST(abs(ncusum) AS DECIMAL(38,0))"))
      .withColumn("negday",
        -datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(struct(col("abs_nc"), col("negday"))).as("m"),
        first(col("n_days")).as("n_days"))
      .select(col("event_type"),
        date_add(to_date(lit("1970-01-01")), (-col("m.negday")).cast("int"))
          .as("cp_day"),
        col("m.abs_nc").cast("long").as("max_abs_ncusum"),
        col("n_days"))
  }

  val q142Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events GROUP BY 1, 2
      |), pre AS (
      |  SELECT event_type, day, cents,
      |    sum(cents) OVER (PARTITION BY event_type ORDER BY day) AS p,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
      |    count(*) OVER (PARTITION BY event_type) AS n_days,
      |    sum(cents) OVER (PARTITION BY event_type) AS s
      |  FROM daily
      |), nc AS (
      |  SELECT event_type, day, n_days,
      |    abs(CAST(n_days AS HUGEINT) * p - CAST(i AS HUGEINT) * s)
      |      AS abs_nc
      |  FROM pre
      |), r AS (
      |  SELECT event_type, day, n_days, abs_nc,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs_nc DESC, day ASC) AS rk
      |  FROM nc
      |)
      |SELECT event_type, day AS cp_day,
      |  CAST(abs_nc AS BIGINT) AS max_abs_ncusum,
      |  CAST(n_days AS BIGINT) AS n_days
      |FROM r WHERE rk = 1""".stripMargin

  /** q140: Gini concentration of revenue per event type — the
    * inequality audit (is 1 % of events producing 99 % of revenue?)
    * that flags monetization skew or bot inflation. Uses the
    * rank-based identity G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over values
    * sorted ascending with rank i = 1..n — which makes it a direct
    * application of [[Rank.groupRank]]'s two-phase plan: no per-type
    * single-task sort, the corpus-sized work is the bucketed rank and
    * one exact aggregate.
    *
    * Exactness: Σ(i·x) runs in Decimal(38,0)/HUGEINT (it outgrows
    * int64 with corpus size); the output is integer ppm with two
    * truncating divisions evaluated identically on both engines. Ties
    * in the ordering cannot perturb the result: within a tie run x is
    * constant, so Σ(i·x) is invariant to how row_number breaks the
    * tie. */
  def q140Gini(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
    Rank.groupRank(ev, Seq("event_type"), "value", Seq("event_id"),
        "rk", "n")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        sum(expr("CAST(rk + 1 AS DECIMAL(38,0)) * cents")).as("wsum"))
      .withColumn("gini_ppm", expr(
        """(2 * wsum * 1000000)
          |  div (CAST(n_events AS DECIMAL(38,0)) * sum_cents)
          |  - ((n_events + 1) * 1000000) div n_events""".stripMargin))
      .select(col("event_type"), col("n_events"), col("sum_cents"),
        col("gini_ppm"))
  }

  val q140Oracle: String =
    """WITH v AS (
      |  SELECT event_type,
      |    CAST(round(value * 100.0) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value ASC, event_id ASC) AS rk1,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  CAST((2 * sum(CAST(rk1 AS HUGEINT) * cents) * 1000000)
      |    // (CAST(count(*) AS HUGEINT) * sum(cents))
      |    - ((count(*) + 1) * CAST(1000000 AS HUGEINT)) // count(*)
      |    AS BIGINT) AS gini_ppm
      |FROM v GROUP BY 1""".stripMargin

  val q135Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events GROUP BY 1, 2
      |), d AS (
      |  SELECT event_type, day, cents,
      |    CAST(datediff('day', DATE '1970-01-01', day) % 7 AS BIGINT)
      |      AS dow
      |  FROM daily
      |), st AS (
      |  SELECT event_type, dow, count(*) AS n,
      |    sum(CAST(cents AS HUGEINT)) AS s,
      |    sum(CAST(cents AS HUGEINT) * cents) AS ss
      |  FROM d GROUP BY 1, 2
      |)
      |SELECT d.event_type, d.day, d.cents, d.dow,
      |  (d.cents * st.n - st.s) * (d.cents * st.n - st.s)
      |    > 9 * (st.n * st.ss - st.s * st.s) AS is_anomaly
      |FROM d JOIN st USING (event_type, dow)""".stripMargin

  /** q145: winsorized account-balance stats per nation — q129's
    * trimmed mean DROPS the tails; winsorizing CLAMPS them to the
    * [P05, P95] nearest-rank boundaries instead, the robustification
    * used when every row must keep weight (billing reconciliation,
    * feature clipping before training). Nearest-rank percentile at
    * p = k/20: the value whose 1-based in-group rank is ceil(p·n) —
    * pure integer arithmetic, no interpolation.
    *
    * Plan: [[Rank.groupRank]]'s bucketed two-phase rank (no per-nation
    * single-task sort) feeds a NATION-COUNT-sized bounds aggregate
    * (one row per group — broadcast is safe by construction); the
    * clamp pass re-reads the raw table and joins the tiny bounds, so
    * the corpus-sized side never carries rank machinery. The output
    * stays in exact cents sums — no mean division, because balances
    * (and thus group sums) can be negative and Spark's truncating
    * integer div differs from DuckDB's flooring `//` below zero. */
  def q145Winsorized(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100.0) AS BIGINT)").as("cents"))
    val ranked = Rank.groupRank(cust, Seq("c_nationkey"), "cents",
        Seq("c_custkey"), "rk", "n")
      .withColumn("t", col("rk") + 1)
    val kLo = expr("(n + 19) div 20")
    val kHi = expr("(19 * n + 19) div 20")
    val bounds = ranked
      .where(col("t") === kLo || col("t") === kHi)
      .groupBy(col("c_nationkey"))
      .agg(min(when(col("t") === kLo, col("cents"))).as("lo_cents"),
        min(when(col("t") === kHi, col("cents"))).as("hi_cents"))
    cust.join(broadcast(bounds), Seq("c_nationkey"))
      .groupBy(col("c_nationkey"), col("lo_cents"), col("hi_cents"))
      .agg(count(lit(1)).as("n_customers"),
        sum(greatest(col("lo_cents"), least(col("hi_cents"), col("cents"))))
          .as("win_sum_cents"))
      .select(col("c_nationkey"), col("n_customers"), col("lo_cents"),
        col("hi_cents"), col("win_sum_cents"))
  }

  val q145Oracle: String =
    """WITH v AS (
      |  SELECT c_nationkey, c_custkey,
      |    CAST(round(c_acctbal * 100.0) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY c_nationkey
      |      ORDER BY CAST(round(c_acctbal * 100.0) AS BIGINT) ASC,
      |        c_custkey ASC) AS t,
      |    count(*) OVER (PARTITION BY c_nationkey) AS n
      |  FROM customer
      |), b AS (
      |  SELECT c_nationkey,
      |    min(CASE WHEN t = (n + 19) // 20 THEN cents END) AS lo_cents,
      |    min(CASE WHEN t = (19 * n + 19) // 20 THEN cents END) AS hi_cents
      |  FROM v
      |  WHERE t = (n + 19) // 20 OR t = (19 * n + 19) // 20
      |  GROUP BY 1
      |)
      |SELECT v.c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
      |  b.lo_cents, b.hi_cents,
      |  CAST(sum(greatest(b.lo_cents, least(b.hi_cents, v.cents)))
      |    AS BIGINT) AS win_sum_cents
      |FROM v JOIN b USING (c_nationkey)
      |GROUP BY 1, 3, 4""".stripMargin

  /** q151: cross-group quantile normalization — map every event's
    * value onto the GLOBAL value distribution at its within-type
    * percentile (the calibration step before mixing heterogeneous
    * per-source scores: a p90 "scroll" value becomes the global p90
    * value, so thresholds mean the same thing across groups). The
    * normalized value is the global order statistic at nearest-rank
    * ceil(t_s·N/n_s) — all-integer, no interpolation.
    *
    * Plan: two bucketed [[Rank.groupRank]] passes (within-type and
    * global — neither a single-task sort), a 1-row count broadcast,
    * and one linear equi-join on the integer target rank; the rank
    * product runs in Decimal(38,0) (t·N overflows int64 at 10¹²-row
    * corpora). Every row keeps its identity — this is a value
    * TRANSFORM, not an aggregate, so the output is corpus-sized by
    * design. */
  def q151QuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
    val nTot = ev.agg(count(lit(1)).as("n_tot"))
    val within = Rank.groupRank(ev, Seq("event_type"), "cents",
        Seq("event_id"), "rk_s", "n_s")
      .withColumn("t_s", col("rk_s") + 1)
    val global = Rank.groupRank(ev, Nil, "cents", Seq("event_id"),
        "rk_g", "n_g")
      .select((col("rk_g") + 1).as("t_g"), col("cents").as("norm_cents"))
    within.crossJoin(broadcast(nTot))
      .withColumn("t_target", expr(
        """CAST((t_s * CAST(n_tot AS DECIMAL(38,0)) + n_s - 1) div n_s
          |  AS BIGINT)""".stripMargin))
      .join(global, col("t_target") === col("t_g"))
      .select(col("event_id"), col("event_type"), col("cents"),
        expr("(t_s * 1000000) div n_s").as("pct_ppm"),
        col("norm_cents"))
  }

  val q151Oracle: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(round(value * 100.0) AS BIGINT) AS cents
      |  FROM events
      |), s AS (
      |  SELECT event_id, event_type, cents,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY cents ASC, event_id ASC) AS t_s,
      |    count(*) OVER (PARTITION BY event_type) AS n_s
      |  FROM e
      |), g AS (
      |  SELECT cents AS norm_cents,
      |    row_number() OVER (ORDER BY cents ASC, event_id ASC) AS t_g
      |  FROM e
      |), n AS (SELECT count(*) AS n_tot FROM e)
      |SELECT s.event_id, s.event_type, s.cents,
      |  CAST((t_s * 1000000) // n_s AS BIGINT) AS pct_ppm,
      |  g.norm_cents
      |FROM s CROSS JOIN n
      |JOIN g ON g.t_g =
      |  (t_s * CAST(n_tot AS HUGEINT) + n_s - 1) // n_s""".stripMargin

  /** q152: exact tie-corrected ROC-AUC per source — does document
    * length predict exact-duplicate membership? The Mann–Whitney
    * identity AUC = (R₁ − n₁(n₁+1)/2) / (n₁n₀) with ties resolved by
    * AVERAGE ranks is evaluated without any per-row rank at all:
    * group rows by (source, score value), exclusive-prefix-sum the
    * value counts per source, and each value group's doubled average
    * rank is the integer 2·cum_before + cnt + 1 — so 2·R₁ (and hence
    * 2·U₁) is a sum of integer products and the AUC is one correctly
    * rounded ppm division at the end. This is the evaluation-metric
    * shape every filter-model comparison needs (CCNet-style quality
    * classifiers): exact, no sort of the corpus, no 0.5-tie
    * approximation.
    *
    * Plan: one digest shuffle for the label (q17's md5 content
    * digest), one (source, value) hash aggregate, then
    * [[Rank.groupPrefixSum]] over the value-grouped frame (bucketed —
    * no per-source single-task window even when a score column is
    * near-continuous), and a sources-sized final aggregate. The big
    * products run in Decimal(38,0)/HUGEINT: 2·R₁ ≤ 2n² overflows
    * int64 past ~3·10⁹ rows per source. Sources with no positives or
    * no negatives yield NULL auc_ppm (0/0 is undefined, not 500000). */
  def q152Auc(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(TF.normText(col("text"))).as("h"))
    // label: the digest appears more than once corpus-wide (q17's
    // exact-dup signal). Digest counts join back on the digest — a
    // plain hash join; the digest table is corpus-sized, never
    // broadcast.
    val dupCnt = docs.groupBy(col("h")).agg(count(lit(1)).as("hc"))
    val labeled = docs.join(dupCnt, Seq("h"))
      .select(col("source"), col("n_chars"),
        when(col("hc") > 1, 1L).otherwise(0L).as("pos"))
    val byValue = labeled.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("posc"))
    val withCum = Rank.groupPrefixSum(byValue, Seq("source"), "n_chars",
        Nil, "cnt", "cum")
      .withColumn("r2", lit(2L) * (col("cum") - col("cnt")) + col("cnt") + 1L)
    withCum.groupBy(col("source"))
      .agg(
        sum(expr("CAST(posc AS DECIMAL(38,0)) * r2")).as("ranksum2"),
        sum(col("posc")).as("n_pos"),
        sum(col("cnt") - col("posc")).as("n_neg"))
      .select(col("source"), col("n_pos"), col("n_neg"),
        expr(
          """CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
            |  ((ranksum2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))
            |    * 1000000)
            |  div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg)
            |END AS BIGINT)""".stripMargin).as("auc_ppm"))
  }

  val q152Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source, n_chars,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
      |  FROM documents
      |), l AS (
      |  SELECT source, n_chars,
      |    CASE WHEN count(*) OVER (PARTITION BY h) > 1
      |      THEN 1 ELSE 0 END AS pos
      |  FROM d
      |), vc AS (
      |  SELECT source, n_chars, count(*) AS cnt, sum(pos) AS posc
      |  FROM l GROUP BY 1, 2
      |), c AS (
      |  SELECT source, cnt, posc,
      |    coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_before
      |  FROM vc
      |), a AS (
      |  SELECT source,
      |    sum(CAST(posc AS HUGEINT) * (2 * cum_before + cnt + 1))
      |      AS ranksum2,
      |    sum(posc) AS n_pos, sum(cnt - posc) AS n_neg
      |  FROM c GROUP BY 1
      |)
      |SELECT source, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(n_neg AS BIGINT) AS n_neg,
      |  CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    ((ranksum2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000)
      |    // (2 * CAST(n_pos AS HUGEINT) * n_neg)
      |  END AS BIGINT) AS auc_ppm
      |FROM a""".stripMargin

  /** q155: exact two-sample Kolmogorov–Smirnov drift per source — the
    * distribution-shift monitor a corpus pipeline runs when a new
    * source lands: sup-distance between each source's document-length
    * distribution and the REST of the corpus. The supremum over real
    * thresholds is attained at a step of the pooled empirical CDF, so
    * evaluating the integer statistic |n_rest·cum_s(v) − n_s·cum_rest(v)|
    * at every pooled distinct value is exact — no binning, no
    * transcendentals, one correctly rounded ppm division at the end
    * (D = max/(n_s·n_rest)).
    *
    * Plan: per-value and per-(source, value) hash-aggregated counts;
    * the pooled-value frame gets its global CDF via
    * [[Rank.globalPrefixSum]] and is then crossed with the
    * sources-sized totals (broadcast — |sources| rows) and left-joined
    * against the per-source counts so every source's CDF is defined at
    * every pooled step; [[Rank.groupPrefixSum]] forms cum_s without a
    * per-source single-task window. The frame is |values|·|sources| —
    * values-scale, not corpus-scale. Products in Decimal(38,0)/HUGEINT
    * (n_rest·cum_s ≤ n² overflows int64 past ~3·10⁹ rows). */
  def q155KsDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("n_chars"))
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val nTot = docs.agg(count(lit(1)).as("n_tot"))
    val perValue = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("c_v"))
    val valueCdf = Rank.globalPrefixSum(perValue, "n_chars", Nil,
      "c_v", "cum_all")
    val perSourceValue = docs.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c_sv"))
    val grid = valueCdf.crossJoin(broadcast(totals))
      .join(perSourceValue, Seq("source", "n_chars"), "left")
      .na.fill(0L, Seq("c_sv"))
    val cums = Rank.groupPrefixSum(grid, Seq("source"), "n_chars",
      Nil, "c_sv", "cum_s")
    cums.crossJoin(broadcast(nTot))
      .withColumn("diff", expr(
        """abs(CAST(n_tot - n_s AS DECIMAL(38,0)) * cum_s
          |  - CAST(n_s AS DECIMAL(38,0)) * (cum_all - cum_s))""".stripMargin))
      .groupBy(col("source"), col("n_s"), col("n_tot"))
      .agg(max(col("diff")).as("d_num"))
      .select(col("source"), col("n_s"),
        (col("n_tot") - col("n_s")).as("n_rest"),
        expr(
          """CAST((d_num * 1000000)
            |  div (CAST(n_s AS DECIMAL(38,0)) * (n_tot - n_s))
            |  AS BIGINT)""".stripMargin).as("ks_ppm"))
  }

  val q155Oracle: String =
    """WITH d AS (SELECT source, n_chars FROM documents),
      |t AS (SELECT source, count(*) AS n_s FROM d GROUP BY 1),
      |n AS (SELECT count(*) AS n_tot FROM d),
      |va AS (SELECT n_chars, count(*) AS c_v FROM d GROUP BY 1),
      |vc AS (SELECT n_chars,
      |  sum(c_v) OVER (ORDER BY n_chars ASC) AS cum_all FROM va),
      |sv AS (SELECT source, n_chars, count(*) AS c_sv
      |  FROM d GROUP BY 1, 2),
      |g AS (
      |  SELECT t.source, t.n_s, vc.n_chars, vc.cum_all,
      |    coalesce(sv.c_sv, 0) AS c_sv
      |  FROM vc CROSS JOIN t
      |  LEFT JOIN sv ON sv.source = t.source AND sv.n_chars = vc.n_chars
      |), c AS (
      |  SELECT source, n_s, n_chars, cum_all,
      |    sum(c_sv) OVER (PARTITION BY source ORDER BY n_chars ASC)
      |      AS cum_s
      |  FROM g
      |)
      |SELECT source, CAST(n_s AS BIGINT) AS n_s,
      |  CAST(n_tot - n_s AS BIGINT) AS n_rest,
      |  CAST(max(abs(CAST(n_tot - n_s AS HUGEINT) * cum_s
      |      - CAST(n_s AS HUGEINT) * (cum_all - cum_s))) * 1000000
      |    // (CAST(n_s AS HUGEINT) * (n_tot - n_s)) AS BIGINT) AS ks_ppm
      |FROM c CROSS JOIN n
      |GROUP BY source, n_s, n_tot""".stripMargin

  /** q176: total-variation drift per event type between the first and
    * second half of the event stream — the binned distribution-shift
    * monitor that complements q155's KS statistic: PSI's binning with a
    * rational statistic (TV = ½·Σ|p−q|) instead of PSI's logarithm, so
    * the ppm output is exact integer arithmetic end to end (no
    * transcendentals to diverge between engines).
    *
    * Plan: ONE grouped pass over events produces per-(type, bin)
    * counts for both halves via conditional aggregation; per-type
    * totals are a second aggregate over that (bins-sized) frame,
    * joined back broadcast. |c_a·n_b − c_b·n_a| keeps the comparison
    * in cross-multiplied integer space; products go Decimal(38,0)
    * (c·n ≤ n² overflows int64 past ~3·10⁹ events). Bins-sized
    * everywhere after the first shuffle. */
  val Q176SplitTs = "2024-01-16"
  val Q176BinWidth = 50.0

  /** The maintainable half of q176: per-(type, bin) reference/current
    * counts. Counts are a mergeable monoid, so this SAME aggregate runs
    * as live streaming state (graft.streaming.DriftStream) — the cells
    * frame is |types|·|bins| rows however long the stream runs. Works
    * on batch AND streaming frames with (event_type, ts, value). */
  def q176Cells(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        floor(col("value") / Q176BinWidth).cast("long").as("bin"),
        (col("ts") < lit(Q176SplitTs)).as("is_a"))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("c_b"))

  /** The finishing half: exact TV statistic over a cells frame —
    * cells-sized input, so it runs per micro-batch (foreachBatch) or
    * as the batch tail of q176 itself. */
  def q176Finish(perBin: DataFrame): DataFrame = {
    val totals = perBin.groupBy(col("event_type"))
      .agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    perBin.join(broadcast(totals), Seq("event_type"))
      .withColumn("diff", expr(
        """abs(CAST(c_a AS DECIMAL(38,0)) * n_b
          |  - CAST(c_b AS DECIMAL(38,0)) * n_a)""".stripMargin))
      .groupBy(col("event_type"), col("n_a"), col("n_b"))
      .agg(sum(col("diff")).as("tv_num"), count(lit(1)).as("n_bins"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("n_bins"),
        expr(
          """CAST((tv_num * 500000)
            |  div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
            .stripMargin).as("tv_ppm"))
  }

  def q176TvDrift(spark: SparkSession, dir: String): DataFrame =
    q176Finish(q176Cells(Tables.load(spark, dir, "events")))

  /** q183: within-group percentile-rank normalization — every event's
    * value mapped to its exact strict-rank percentile (ppm) within its
    * event type: the rank-based feature transform (the per-group face
    * of q151's cross-distribution quantile map). pct = |{v' < v}| /
    * (n_g − 1), exact integers end to end.
    *
    * Plan: q152's value-grouping trick — counts aggregate per (type,
    * value), the EXCLUSIVE prefix count comes from
    * [[Rank.groupPrefixSum]] over the per-value frame (values-scale,
    * no per-event window, no group-sized sort), and events join back
    * on (type, value): every tied event shares one rank row. Group
    * totals are a |types|-row broadcast. */
  def q183PercentileRank(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        Exact.units(col("value"), 2).as("value_centi"))
    val perValue = ev.groupBy(col("event_type"), col("value_centi"))
      .agg(count(lit(1)).as("c_v"))
    val cum = Rank.groupPrefixSum(perValue, Seq("event_type"),
        "value_centi", Nil, "c_v", "cum_le")
      .withColumn("cnt_lt", col("cum_le") - col("c_v"))
    val totals = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_g"))
    ev.join(cum.select(col("event_type"), col("value_centi"),
        col("cnt_lt")), Seq("event_type", "value_centi"))
      .join(broadcast(totals), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value_centi"),
        expr("""CAST(CASE WHEN n_g > 1 THEN
               |  (cnt_lt * 1000000) div (n_g - 1)
               |  ELSE 0 END AS BIGINT)""".stripMargin).as("pct_ppm"))
  }

  val q183Oracle: String =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |    CAST(round(value * 100.0) AS BIGINT) AS value_centi
      |  FROM events
      |), r AS (
      |  SELECT event_id, event_type, value_centi,
      |    count(*) OVER (PARTITION BY event_type) AS n_g,
      |    rank() OVER (PARTITION BY event_type
      |                 ORDER BY value_centi ASC) - 1 AS cnt_lt
      |  FROM ev
      |)
      |SELECT event_id, event_type, value_centi,
      |  CAST(CASE WHEN n_g > 1 THEN (cnt_lt * 1000000) // (n_g - 1)
      |    ELSE 0 END AS BIGINT) AS pct_ppm
      |FROM r""".stripMargin

  /** q185: seasonal-naive forecast error (the MASE shape) — how
    * predictable is each event type's hourly volume? The capacity-
    * planning baseline check: compare the day-ago seasonal-naive
    * forecast (count at hour h−24) against the hour-ago naive (count
    * at h−1); mase_ppm < 10⁶ means daily seasonality beats trend.
    * Entirely integer: counts, absolute differences, one ppm division.
    *
    * Plan: ONE corpus-sized aggregate to the (type, hour) frame
    * (≤ |types|·|hours| rows); both baselines are self-joins over that
    * aggregate keyed on (type, hour−lag) — aggregate-scale, no
    * windows; the evaluation restricts to hours where both forecasts
    * exist so the two MAEs average over the SAME support. */
  def q185SeasonalError(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.load(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"))
    val cur = hourly.select(col("event_type"), col("h"), col("c"))
    val day = hourly.select(col("event_type"),
      (col("h") + 24).as("h"), col("c").as("c_day"))
    val prev = hourly.select(col("event_type"),
      (col("h") + 1).as("h"), col("c").as("c_prev"))
    cur.join(day, Seq("event_type", "h"))
      .join(prev, Seq("event_type", "h"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("c") - col("c_day"))).as("mae_seasonal_num"),
        sum(abs(col("c") - col("c_prev"))).as("mae_naive_num"))
      .select(col("event_type"), col("n_hours"),
        col("mae_seasonal_num"), col("mae_naive_num"),
        expr("""CAST(CASE WHEN mae_naive_num > 0 THEN
               |  (mae_seasonal_num * 1000000) div mae_naive_num
               |  END AS BIGINT)""".stripMargin).as("mase_ppm"))
  }

  val q185Oracle: String =
    """WITH hourly AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT cur.event_type, count(*) AS n_hours,
      |  CAST(sum(abs(cur.c - day.c)) AS BIGINT) AS mae_seasonal_num,
      |  CAST(sum(abs(cur.c - prev.c)) AS BIGINT) AS mae_naive_num,
      |  CAST(CASE WHEN sum(abs(cur.c - prev.c)) > 0 THEN
      |    (sum(abs(cur.c - day.c)) * 1000000) // sum(abs(cur.c - prev.c))
      |    END AS BIGINT) AS mase_ppm
      |FROM hourly cur
      |JOIN hourly day ON day.event_type = cur.event_type
      |  AND day.h = cur.h - 24
      |JOIN hourly prev ON prev.event_type = cur.event_type
      |  AND prev.h = cur.h - 1
      |GROUP BY 1""".stripMargin

  val q176Oracle: String =
    s"""WITH ev AS (
       |  SELECT event_type,
       |    CAST(floor(value / $Q176BinWidth) AS BIGINT) AS bin,
       |    ts < TIMESTAMP '$Q176SplitTs' AS is_a
       |  FROM events
       |), per_bin AS (
       |  SELECT event_type, bin,
       |    sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS c_a,
       |    sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS c_b
       |  FROM ev GROUP BY 1, 2
       |), tot AS (
       |  SELECT event_type, sum(c_a) AS n_a, sum(c_b) AS n_b
       |  FROM per_bin GROUP BY 1
       |)
       |SELECT p.event_type, CAST(t.n_a AS BIGINT) AS n_a,
       |  CAST(t.n_b AS BIGINT) AS n_b,
       |  count(*) AS n_bins,
       |  CAST(sum(abs(CAST(p.c_a AS HUGEINT) * t.n_b
       |      - CAST(p.c_b AS HUGEINT) * t.n_a)) * 500000
       |    // (CAST(t.n_a AS HUGEINT) * t.n_b) AS BIGINT) AS tv_ppm
       |FROM per_bin p JOIN tot t USING (event_type)
       |GROUP BY p.event_type, t.n_a, t.n_b""".stripMargin

  /** q191: autocorrelation function — per event type, the lag-k
    * Pearson autocorrelation (k = 1..[[AcfMaxLag]]) of the DENSE
    * hourly count series. The periodicity probe a training-data
    * pipeline runs before trusting "events are i.i.d." sampling
    * assumptions: high ACF at lag 24 means daily cycles, at lag 1
    * means bursts; both bias any time-sliced split. Dense matters:
    * skipping empty hours (as the q185 error joins legitimately do
    * for their metric) would splice non-adjacent hours together and
    * fabricate correlation — the grid zero-fills every hour in the
    * global span.
    *
    * Determinism: moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact
    * integer sums (the q72 discipline — the double-space subtraction
    * n·Σxy − ΣxΣy diverges by ulps across engines); only the final
    * r = num / √(den_x · den_y) converts to double, with identical
    * expressions both sides. Constant series → NULL (0/0 guarded).
    *
    * Scale shape: hourly counts are one map-side-combined aggregate;
    * the grid is |types| × span rows (≪ events); each lag join is an
    * equi-join hash-partitioned on (type, hour); moments are one
    * aggregate per (type, lag). No window over a trivial-cardinality
    * key, no driver state. */
  val AcfMaxLag = 3

  def q191Acf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("h"))
    val hourly = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("cnt"))
    val span = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = hourly.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val series = grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("cnt"), lit(0L)).as("x"))
    val pairs = (1 to AcfMaxLag).map { k =>
      series.select(col("event_type"), col("h"), col("x"))
        .join(series.select(col("event_type"), (col("h") - k).as("h"),
          col("x").as("y")), Seq("event_type", "h"))
        .select(col("event_type"), lit(k.toLong).as("lag"), col("x"), col("y"))
    }.reduce(_ unionByName _)
    // moments in Decimal(38,0) (q72's discipline): long products of
    // per-hour counts would wrap silently at extreme scale while
    // DuckDB's HUGEINT would not
    pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .select(col("event_type"), col("lag"), col("n"),
        expr("CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("acf_num"),
        expr("""CASE WHEN n * sxx - CAST(sx AS DECIMAL(38,0)) * sx > 0
               |   AND n * syy - CAST(sy AS DECIMAL(38,0)) * sy > 0
               |  THEN CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) /
               |    sqrt(CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) *
               |         CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))
               |  END""".stripMargin).as("acf"))
  }

  val q191Oracle: String =
    s"""WITH ev AS (
       |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h
       |  FROM events
       |), hourly AS (
       |  SELECT event_type, h, CAST(count(*) AS BIGINT) AS cnt
       |  FROM ev GROUP BY 1, 2
       |), span AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
       |grid AS (
       |  SELECT et.event_type, unnest(generate_series(s.h0, s.h1)) AS h
       |  FROM (SELECT DISTINCT event_type FROM hourly) et CROSS JOIN span s
       |), series AS (
       |  SELECT g.event_type, g.h, coalesce(hourly.cnt, 0) AS x
       |  FROM grid g LEFT JOIN hourly
       |    ON hourly.event_type = g.event_type AND hourly.h = g.h
       |), pairs AS (
       |${(1 to AcfMaxLag).map(k =>
      s"""  SELECT a.event_type, CAST($k AS BIGINT) AS lag, a.x, b.x AS y
         |  FROM series a JOIN series b
         |    ON b.event_type = a.event_type AND b.h = a.h + $k""".stripMargin)
      .mkString("\n  UNION ALL\n")}
       |), m AS (
       |  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM pairs GROUP BY 1, 2)
       |SELECT event_type, lag, n,
       |  CAST(n * sxy - sx * sy AS BIGINT) AS acf_num,
       |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       |    THEN CAST(n * sxy - sx * sy AS DOUBLE) /
       |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
       |           CAST(n * syy - sy * sy AS DOUBLE))
       |    END AS acf
       |FROM m""".stripMargin

  /** q202 smoothing depth: 8 terms of the α=1/2 EMA, integer weights
    * 128,64,…,1 (the geometric tail past 8 terms is < 1/256 of the
    * mass — truncating it is what keeps the arithmetic exact). */
  val EmaTerms = 8

  /** q202: exponential smoothing over each event type's hourly count
    * series — the classic streaming-monitoring smoother (the EWMA of
    * control charts), made ORACLE-EXACT by truncation: the α=1/2 EMA's
    * weights are 2⁻¹…2⁻⁸ scaled to integers 128…1, so the smoothed
    * value is a ratio of two integer sums (num/den, emitted in milli
    * units) instead of the textbook's unboundedly-compounding float
    * recurrence. Early rows (fewer than 8 predecessors) renormalize
    * over the weights actually present — the standard "adjusted" EWMA.
    *
    * Runs on OBSERVED hours ordered per type (compose with q97's LOCF
    * gap-fill first when a gap-free grid matters). The window is
    * partitioned by event_type and framed to 8 rows: per-partition
    * state is the series length (time-bounded, not corpus-bounded),
    * the same partition discipline as q185/q191. */
  def q202Ema(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val lags = (0 until EmaTerms).map(i =>
      (if (i == 0) col("c") else lag(col("c"), i).over(w)).as(s"l$i"))
    val num = (0 until EmaTerms).map(i =>
      coalesce(col(s"l$i"), lit(0L)) * lit(1L << (EmaTerms - 1 - i)))
      .reduce(_ + _)
    val den = (0 until EmaTerms).map(i =>
      when(col(s"l$i").isNotNull, lit(1L << (EmaTerms - 1 - i)))
        .otherwise(lit(0L)))
      .reduce(_ + _)
    hourly.select((Seq(col("event_type"), col("h"), col("c")) ++ lags): _*)
      .select(col("event_type"), col("h"), col("c"),
        num.as("ema_num"), den.as("ema_den"),
        expr("ema_num * 1000 div ema_den").as("ema_milli"))
      .select(col("event_type"), col("h"), col("c"), col("ema_num"),
        col("ema_den"), col("ema_milli"))
  }

  val q202Oracle: String = {
    val lagDefs = (1 until EmaTerms).map(i =>
      s"lag(c, $i) OVER (PARTITION BY event_type ORDER BY h) AS l$i")
      .mkString(",\n      |    ")
    val num = (0 until EmaTerms).map(i =>
      s"coalesce(l$i, 0) * ${1L << (EmaTerms - 1 - i)}").mkString(" + ")
    val den = (0 until EmaTerms).map(i =>
      s"CASE WHEN l$i IS NOT NULL THEN ${1L << (EmaTerms - 1 - i)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH hourly AS (
       |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
       |    count(*) AS c
       |  FROM events GROUP BY 1, 2
       |), lagged AS (
       |  SELECT event_type, h, c, c AS l0,
       |    $lagDefs
       |  FROM hourly
       |), terms AS (
       |  SELECT event_type, h, c,
       |    $num AS ema_num,
       |    $den AS ema_den
       |  FROM lagged)
       |SELECT event_type, CAST(h AS BIGINT) AS h, CAST(c AS BIGINT) AS c,
       |  CAST(ema_num AS BIGINT) AS ema_num, CAST(ema_den AS BIGINT) AS ema_den,
       |  CAST(ema_num * 1000 // ema_den AS BIGINT) AS ema_milli
       |FROM terms""".stripMargin
  }

  /** q205: time-weighted average of the event value per type — the
    * piecewise-constant integral every IoT/market-data store offers
    * (`twavg`): each observation holds until the next one, so the mean
    * over the observed span is Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first),
    * not the row mean (bursts of cheap readings must not drown a
    * long-held expensive level). Values in exact integer cents,
    * durations in whole seconds → both sums and the final milli-cent
    * division replay bit-exactly. Duplicate timestamps within a type
    * tie-break on event_id: the earlier rows of a tie carry zero
    * duration — the standard last-value-at-t convention, deterministic
    * on both engines.
    *
    * The successor lookup is NOT a per-type window (event_type has
    * trivial cardinality — a corpus-sized single-task sort at scale,
    * the plan shape PlanLintSpec bans): ranks come from the bucketed
    * two-phase [[Rank.groupRank]] and the successor is an equi-join on
    * (type, rank+1) — all hash-partitioned. */
  def q205TimeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("unix_timestamp(ts)").as("t"),
        graft.ops.Exact.units(col("value"), 2).as("v"))
    val ranked = Rank.groupRank(ev, Seq("event_type"), "t", Seq("event_id"),
      "rk", "n").persist()
    val nxt = ranked.select(col("event_type"), (col("rk") - 1).as("rk"),
      col("t").as("t_next"))
    ranked.join(nxt, Seq("event_type", "rk"))
      .select(col("event_type"), col("v"), (col("t_next") - col("t")).as("dur"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("dur")).as("span_sec"),
        sum(col("v") * col("dur")).as("twa_num"))
      .select(col("event_type"), col("n_segments"), col("span_sec"),
        col("twa_num"),
        expr("CASE WHEN span_sec > 0 THEN (twa_num * 1000) div span_sec " +
          "END").as("twa_milli_cents"))
  }

  val q205Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS t,
      |    CAST(round(value * 100.0) AS BIGINT) AS v
      |  FROM events
      |), seg AS (
      |  SELECT event_type, v,
      |    lead(t) OVER (PARTITION BY event_type ORDER BY t, event_id) - t
      |      AS dur
      |  FROM ev)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
      |  CAST(sum(dur) AS BIGINT) AS span_sec,
      |  CAST(sum(v * dur) AS BIGINT) AS twa_num,
      |  CAST(CASE WHEN sum(dur) > 0
      |    THEN (sum(v * dur) * 1000) // sum(dur) END AS BIGINT)
      |    AS twa_milli_cents
      |FROM seg WHERE dur IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** q201 histogram resolution: keys bucketed by `custkey % 64`. */
  val CardBuckets = 64

  /** q201: join-cardinality estimation quality — the statistic a
    * cost-based optimizer actually uses, MEASURED against truth. For
    * the orders⋈events (o_custkey = user_id) equi-join — both sides
    * genuinely multi-valued per key, so the uniformity assumption has
    * something to get wrong — keys are bucketed into 64
    * histogram cells; per cell the textbook estimator
    * |A⋈B| ≈ nA·nB / max(dA, dB) (uniform-frequency within cell,
    * containment of the smaller key set — Selinger et al. 1979) is
    * compared with the exact per-key Σ cntA(k)·cntB(k). The output's
    * err_ppm column is the reason to run this at 100 TB: it tells you
    * per histogram cell how badly skew breaks the uniformity
    * assumption BEFORE the optimizer picks a catastrophic plan — the
    * measurement a `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`
    * histogram feeds into Spark's own CBO.
    *
    * Plan: two per-bucket aggregates (count + distinct via per-key
    * pre-agg), one exact per-key product sum, all hash-partitioned on
    * bucket/key; output is histogram-sized (64 rows + 1 total). */
  def q201JoinCardEst(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("k"), (col("o_custkey") % CardBuckets).as("b"))
    val b = Tables.load(spark, dir, "events")
      .select(col("user_id").as("k"), (col("user_id") % CardBuckets).as("b"))
    def perKey(df: DataFrame): DataFrame =
      df.groupBy(col("b"), col("k")).agg(count(lit(1)).as("c"))
    val ka = perKey(a).persist()
    val kb = perKey(b).persist()
    def perBucket(keyed: DataFrame, n: String, d: String): DataFrame =
      keyed.groupBy(col("b"))
        .agg(sum(col("c")).as(n), count(lit(1)).as(d))
    val stats = perBucket(ka, "n_a", "d_a")
      .join(perBucket(kb, "n_b", "d_b"), Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("d_a"), lit(0L)).as("d_a"),
        coalesce(col("d_b"), lit(0L)).as("d_b"))
    val actual = ka.join(kb.withColumnRenamed("c", "c2"), Seq("b", "k"))
      .groupBy(col("b")).agg(sum(col("c") * col("c2")).as("actual"))
    val cells = stats.join(actual, Seq("b"), "left")
      .select(col("b").as("bucket"), col("n_a"), col("n_b"),
        expr("CASE WHEN greatest(d_a, d_b) = 0 THEN 0 " +
          "ELSE (n_a * n_b) div greatest(d_a, d_b) END").as("est"),
        coalesce(col("actual"), lit(0L)).as("actual"))
    cells.select(col("bucket"), col("n_a"), col("n_b"), col("est"),
        col("actual"),
        expr("CASE WHEN actual = 0 THEN -1L " +
          "ELSE abs(est - actual) * 1000000 div actual END").as("err_ppm"))
  }

  val q201Oracle: String =
    s"""WITH ka AS (
       |  SELECT o_custkey % $CardBuckets AS b, o_custkey AS k, count(*) AS c
       |  FROM orders GROUP BY 1, 2
       |), kb AS (
       |  SELECT user_id % $CardBuckets AS b, user_id AS k, count(*) AS c
       |  FROM events GROUP BY 1, 2
       |), sa AS (
       |  SELECT b, sum(c) AS n_a, count(*) AS d_a FROM ka GROUP BY 1
       |), sb AS (
       |  SELECT b, sum(c) AS n_b, count(*) AS d_b FROM kb GROUP BY 1
       |), st AS (
       |  SELECT coalesce(sa.b, sb.b) AS b,
       |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
       |    coalesce(d_a, 0) AS d_a, coalesce(d_b, 0) AS d_b
       |  FROM sa FULL OUTER JOIN sb ON sa.b = sb.b
       |), act AS (
       |  SELECT ka.b, sum(ka.c * kb.c) AS actual
       |  FROM ka JOIN kb ON ka.b = kb.b AND ka.k = kb.k GROUP BY 1
       |), cells AS (
       |  SELECT st.b AS bucket, n_a, n_b,
       |    CASE WHEN greatest(d_a, d_b) = 0 THEN 0
       |      ELSE (n_a * n_b) // greatest(d_a, d_b) END AS est,
       |    coalesce(actual, 0) AS actual
       |  FROM st LEFT JOIN act ON act.b = st.b)
       |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_a AS BIGINT) AS n_a,
       |  CAST(n_b AS BIGINT) AS n_b, CAST(est AS BIGINT) AS est,
       |  CAST(actual AS BIGINT) AS actual,
       |  CAST(CASE WHEN actual = 0 THEN -1
       |    ELSE abs(est - actual) * 1000000 // actual END AS BIGINT) AS err_ppm
       |FROM cells""".stripMargin

  /** q222: split-conformal prediction intervals (Vovk et al.; the
    * distribution-free uncertainty-quantification step an ML pipeline
    * runs before serving point predictions). Per market segment: a
    * deterministic md5 coin splits orders into calibration and test
    * halves; the "model" is the calibration mean price; the
    * nonconformity score is the absolute residual; q̂ is the
    * ⌈0.9·(n+1)⌉-th smallest calibration score; coverage is the test
    * fraction inside ±q̂ (guaranteed ≥ 90% marginally).
    *
    * Exactness: residuals against a MEAN would leave integer space, so
    * scores are cross-multiplied — score = |price·n − Σprice| (cents ×
    * n, an exact long) — which preserves the ranking and the coverage
    * comparison within each segment. The calibration quantile is found
    * by [[Rank.groupRank]]'s bucketed two-phase plan (no per-segment
    * single-task sort at 100 TB); the 5-row q̂ table broadcasts back
    * onto the test side for one conditional-count pass. */
  def q222ConformalInterval(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
        graft.ops.Exact.units(col("o_totalprice"), 2).as("cents"),
        (substring(md5(concat(lit("cf_"), col("o_orderkey").cast("string"))),
          1, 1) <= "7").as("is_calib"))
    val calStats = orders.filter(col("is_calib"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_calib"),
        sum(col("cents").cast("decimal(38,0)")).as("sum_cents"))
    // persisted: the orders⋈customer join feeds THREE consumers (the
    // calibration rank, the q̂ lookup's child, the test-side count) —
    // without it each re-runs the join and the calStats aggregate
    // (A/B at 8× sf0.1: 23.3 s → 4.0 s); Bench releases it per run
    val scored = orders
      .join(broadcast(calStats), "segment")
      .withColumn("score",
        abs(col("cents").cast("decimal(38,0)") * col("n_calib") -
          col("sum_cents")).cast("decimal(38,0)"))
      .persist()
    val calib = scored.filter(col("is_calib"))
      .select(col("segment"), col("o_orderkey"),
        col("score").cast("long").as("score"), col("n_calib"))
    val ranked = Rank.groupRank(calib, Seq("segment"), "score",
      Seq("o_orderkey"), "rk", "n")
    // 1-based conformal index k = ceil(0.9 * (n+1)), capped at n
    val qhat = ranked
      .filter(col("rk") ===
        least(expr("(9 * (n_calib + 1) + 9) div 10"), col("n_calib")) - 1L)
      .select(col("segment"), col("score").as("qhat_scaled"))
    scored.filter(!col("is_calib"))
      .join(broadcast(qhat), "segment")
      .groupBy(col("segment"))
      .agg(max(col("n_calib")).as("n_calib"),
        count(lit(1)).as("n_test"),
        max(col("qhat_scaled")).as("qhat_scaled"),
        sum(when(col("score").cast("long") <= col("qhat_scaled"), 1L)
          .otherwise(0L)).as("covered"))
      .select(col("segment"), col("n_calib"), col("n_test"),
        col("qhat_scaled"), col("covered"),
        expr("CAST(covered AS DECIMAL(38,0)) * 1000000 div n_test")
          .as("coverage_ppm"))
  }

  val q222Oracle: String =
    """WITH o AS (
      |  SELECT c.c_mktsegment AS segment, o.o_orderkey,
      |    CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS cents,
      |    substring(md5('cf_' || o.o_orderkey), 1, 1) <= '7' AS is_calib
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |), cs AS (
      |  SELECT segment, count(*) AS n_calib,
      |    sum(CAST(cents AS HUGEINT)) AS sum_cents
      |  FROM o WHERE is_calib GROUP BY 1
      |), sc AS (
      |  SELECT o.segment, o.o_orderkey, o.is_calib, cs.n_calib,
      |    abs(CAST(o.cents AS HUGEINT) * cs.n_calib - cs.sum_cents) AS score
      |  FROM o JOIN cs ON o.segment = cs.segment
      |), rk AS (
      |  SELECT segment, score, n_calib,
      |    row_number() OVER (PARTITION BY segment
      |      ORDER BY score, o_orderkey) AS r
      |  FROM sc WHERE is_calib
      |), qh AS (
      |  SELECT segment, CAST(score AS BIGINT) AS qhat_scaled
      |  FROM rk
      |  WHERE r = least((9 * (n_calib + 1) + 9) // 10, n_calib)
      |)
      |SELECT sc.segment, CAST(max(sc.n_calib) AS BIGINT) AS n_calib,
      |  count(*) AS n_test,
      |  CAST(max(qh.qhat_scaled) AS BIGINT) AS qhat_scaled,
      |  CAST(sum(CASE WHEN sc.score <= qh.qhat_scaled THEN 1 ELSE 0 END)
      |    AS BIGINT) AS covered,
      |  CAST(sum(CASE WHEN sc.score <= qh.qhat_scaled THEN 1 ELSE 0 END)
      |    * 1000000 // count(*) AS BIGINT) AS coverage_ppm
      |FROM sc JOIN qh ON sc.segment = qh.segment
      |WHERE NOT sc.is_calib
      |GROUP BY 1""".stripMargin

  /** q224: A/B experiment readout with an EXACT chi-squared test. Users
    * split by id parity (the deterministic assignment an experiment
    * platform would hash); conversion = the user ever fired a
    * `purchase` event. The 2×2 independence statistic
    * χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) and the relative lift are
    * computed in 128-bit decimal integer space, and significance at
    * α = 0.05 is decided by EXACT cross-multiplication against the
    * critical value 3.8415 (scaled ×10⁴) — no floating-point boundary
    * can flip the verdict on either engine. (At extreme N the χ²
    * numerator square would outgrow decimal(38); a production variant
    * switches to the identical cross-multiplied inequality on reduced
    * fractions — the verdict column already is that inequality.)
    *
    * One corpus aggregate to per-user flags, one 4-cell rollup:
    * map-side partials everywhere, a single 1-row result. */
  def q224AbChisq(spark: SparkSession, dir: String): DataFrame = {
    // conversion = the user fired MORE purchases than errors: a
    // per-user share comparison stays balanced at every scale factor,
    // where "ever purchased" saturates to 100% as events-per-user grow
    // (and a saturated margin zeroes the chi-squared denominator)
    val users = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
          sum(when(col("event_type") === "error", 1L).otherwise(0L)), 1L)
        .otherwise(0L).as("conv"))
      .select((col("user_id") % 2L === 1L).as("treat"), col("conv"))
    val cells = users.agg(
      sum(when(col("treat") && col("conv") === 1L, 1L).otherwise(0L)).as("a"),
      sum(when(col("treat") && col("conv") === 0L, 1L).otherwise(0L)).as("b"),
      sum(when(!col("treat") && col("conv") === 1L, 1L).otherwise(0L)).as("c"),
      sum(when(!col("treat") && col("conv") === 0L, 1L).otherwise(0L)).as("d"))
    cells.select(
        (col("a") + col("b")).as("n_treat"), col("a").as("conv_treat"),
        (col("c") + col("d")).as("n_ctrl"), col("c").as("conv_ctrl"),
        // truncate-toward-zero on BOTH engines: abs first, resign after.
        // (Belt-and-braces: DuckDB's `//` empirically truncates toward
        // zero like Spark's `div` — SELECT -657 // 2 → -328 — so the
        // abs/resign form is equivalent to plain div; it is kept because
        // it is correct under EITHER division convention.)
        // zero-denominator guard (identical on both engines): a control
        // arm with no conversions, or an empty arm, yields NULL rather
        // than Spark-NULL-vs-DuckDB-error divergence (q205's discipline)
        expr("""CASE WHEN c = 0 OR a + b = 0 THEN NULL ELSE
               | CAST(CASE WHEN CAST(a AS DECIMAL(38,0)) * (c + d) >=
               |   CAST(c AS DECIMAL(38,0)) * (a + b) THEN 1 ELSE -1 END
               | * (abs(CAST(a AS DECIMAL(38,0)) * (c + d)
               |        - CAST(c AS DECIMAL(38,0)) * (a + b)) * 1000000
               |    div (CAST(c AS DECIMAL(38,0)) * (a + b))) AS BIGINT)
               |END""".stripMargin).as("lift_ppm"),
        expr("""CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0
               | THEN NULL ELSE
               | CAST(CAST(a + b + c + d AS DECIMAL(38,0))
               | * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
               | * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
               | * 1000000
               | div (CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d))
               |   AS BIGINT)
               |END""".stripMargin).as("chi2_e6"),
        expr("""CAST(a + b + c + d AS DECIMAL(38,0))
               | * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
               | * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
               | * 10000 >=
               | CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d)
               | * 38415""".stripMargin).as("significant"))
  }

  val q224Oracle: String =
    """WITH u AS (
      |  SELECT user_id % 2 = 1 AS treat,
      |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |           > sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |         THEN 1 ELSE 0 END AS conv
      |  FROM events GROUP BY user_id
      |), cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN treat AND conv = 1 THEN 1 ELSE 0 END)
      |      AS HUGEINT) AS a,
      |    CAST(sum(CASE WHEN treat AND conv = 0 THEN 1 ELSE 0 END)
      |      AS HUGEINT) AS b,
      |    CAST(sum(CASE WHEN NOT treat AND conv = 1 THEN 1 ELSE 0 END)
      |      AS HUGEINT) AS c,
      |    CAST(sum(CASE WHEN NOT treat AND conv = 0 THEN 1 ELSE 0 END)
      |      AS HUGEINT) AS d
      |  FROM u)
      |SELECT CAST(a + b AS BIGINT) AS n_treat, CAST(a AS BIGINT)
      |    AS conv_treat,
      |  CAST(c + d AS BIGINT) AS n_ctrl, CAST(c AS BIGINT) AS conv_ctrl,
      |  CASE WHEN c = 0 OR a + b = 0 THEN NULL ELSE
      |    CAST(CASE WHEN a * (c + d) >= c * (a + b) THEN 1 ELSE -1 END
      |    * (abs(a * (c + d) - c * (a + b)) * 1000000 // (c * (a + b)))
      |    AS BIGINT) END AS lift_ppm,
      |  CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0
      |    THEN NULL ELSE
      |    CAST((a + b + c + d) * (a * d - b * c) * (a * d - b * c) * 1000000
      |    // ((a + b) * (c + d) * (a + c) * (b + d)) AS BIGINT)
      |    END AS chi2_e6,
      |  (a + b + c + d) * (a * d - b * c) * (a * d - b * c) * 10000 >=
      |    (a + b) * (c + d) * (a + c) * (b + d) * 38415 AS significant
      |FROM cells""".stripMargin

  /** q242: Gini-impurity diversity profile of the corpus's categorical
    * columns — the exact-arithmetic companion to q206's NDV scan:
    * NDV says how MANY values a column holds, impurity says how
    * BALANCED they are (1 − Σpᵢ², the probability two random rows
    * disagree — CART's split criterion, and the "is this mixture
    * collapsing to one source/language" alarm a training-data pipeline
    * watches). Entropy would need a transcendental log; Gini is pure
    * integer arithmetic: impurity_ppm = (n² − Σc²)·10⁶ div n², with
    * the modal share alongside for the same money.
    *
    * Scale shape: the columns melt through one generated `stack` into
    * (column, value) pairs — ONE shuffle over the melted corpus builds
    * the per-value counts (map-combined), and the impurity rollup
    * re-aggregates the counts frame, bounded by Σ per-column NDV.
    * Products run in DECIMAL(38,0): n² overflows a long past ~3e9
    * rows. */
  val Q242Cols: Seq[(String, String)] = Seq(
    "documents" -> "lang", "documents" -> "source",
    "events" -> "event_type", "orders" -> "o_orderpriority")

  def q242GiniImpurity(spark: SparkSession, dir: String): DataFrame = {
    Q242Cols.groupBy(_._1).toSeq.map { case (table, cols) =>
      val pairs = cols.map(_._2).map { c =>
        s"'$c', CAST(`$c` AS STRING)"
      }.mkString(", ")
      Tables.load(spark, dir, table)
        .select(expr(s"stack(${cols.length}, $pairs)")
          .as(Seq("col_name", "val")))
        .groupBy(col("col_name"), col("val"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("col_name"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
          sum(col("c") * col("c")).as("sum_c2"),
          max(col("c")).as("top_cnt"))
        .select(lit(table).as("table_name"), col("col_name"), col("n"),
          col("n_distinct"),
          expr("""CAST((CAST(n AS DECIMAL(38,0)) * n
                 | - CAST(sum_c2 AS DECIMAL(38,0))) * 1000000
                 | div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"""
            .stripMargin).as("gini_ppm"),
          expr("CAST(CAST(top_cnt AS DECIMAL(38,0)) * 1000000 div n" +
            " AS BIGINT)").as("top_share_ppm"))
    }.reduce(_ unionByName _)
  }

  /** q252: rank-correlation audit (Spearman ρ + Kendall τ) between two
    * per-nation business metrics — revenue rank vs order-count rank.
    * The metric-agreement question every dashboard migration and
    * ranking-model eval asks ("do the two orderings tell the same
    * story?"), answered with BOTH classical rank statistics: ρ from
    * squared rank displacements, τ from pairwise concordance — exact
    * integers end to end (ranks by strict (metric, key) comparison
    * count, a defined total order; one truncating ppm division per
    * statistic), so the result hash-matches DuckDB bit-for-bit where
    * a float covariance formulation would not.
    *
    * Scale shape: the corpus collapses to the |nations|-row metric
    * frame in one map-combined aggregate (dimension joins broadcast);
    * ranks and concordance both come from the frame's self-join —
    * |nations|² pairs, aggregate-sized squared, NEVER the corpus —
    * and no Window node exists anywhere in the plan (ranks are
    * smaller-than counts, the PlanLint-cleanest formulation). */
  def q252RankCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    // no broadcast hint on customer (grows with the corpus — q138 rule);
    // the optimizer broadcasts the 2-column projection while it fits
    val nat = Tables.load(spark, dir, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(sum(Exact.units(col("o_totalprice"), 2)).as("rev"),
        count(lit(1)).as("cnt"))
      .persist()
    val b = nat.select(col("nk").as("nk2"), col("rev").as("rev2"),
      col("cnt").as("cnt2"))
    // strict-total-order ranks: #rows sorting strictly before (metric, key)
    val ranked = nat.crossJoin(broadcast(b))
      .groupBy(col("nk"))
      .agg(
        sum(when(col("rev2") < col("rev") ||
          (col("rev2") === col("rev") && col("nk2") < col("nk")), 1L)
          .otherwise(0L)).as("r_rev"),
        sum(when(col("cnt2") < col("cnt") ||
          (col("cnt2") === col("cnt") && col("nk2") < col("nk")), 1L)
          .otherwise(0L)).as("r_cnt"))
    val spearman = ranked
      .agg(count(lit(1)).as("n"),
        sum((col("r_rev") - col("r_cnt")) * (col("r_rev") - col("r_cnt")))
          .as("sum_d2"))
    val kendall = nat.crossJoin(broadcast(b)).filter(col("nk") < col("nk2"))
      .agg(
        sum(when((col("rev") - col("rev2")) * (col("cnt") - col("cnt2")) > 0,
          1L).otherwise(0L)).as("concordant"),
        sum(when((col("rev") - col("rev2")) * (col("cnt") - col("cnt2")) < 0,
          1L).otherwise(0L)).as("discordant"),
        sum(when(col("rev") === col("rev2") || col("cnt") === col("cnt2"),
          1L).otherwise(0L)).as("tied_pairs"))
    spearman.crossJoin(broadcast(kendall))
      .select(col("n"), col("sum_d2"),
        expr("""CAST(1000000 - CAST(6 AS DECIMAL(38,0)) * sum_d2 * 1000000
               | div (CAST(n AS DECIMAL(38,0)) * (n * n - 1)) AS BIGINT)"""
          .stripMargin).as("spearman_ppm"),
        col("concordant"), col("discordant"), col("tied_pairs"),
        expr("""CAST((CAST(concordant AS DECIMAL(38,0)) - discordant)
               | * 1000000 div (CAST(n AS DECIMAL(38,0)) * (n - 1) div 2)
               | AS BIGINT)""".stripMargin).as("tau_ppm"))
  }

  val q252Oracle: String =
    """WITH nat AS (
      |  SELECT c.c_nationkey AS nk,
      |    CAST(sum(CAST(round(o.o_totalprice * 100.0) AS HUGEINT))
      |      AS BIGINT) AS rev,
      |    count(*) AS cnt
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1
      |), ranked AS (
      |  SELECT a.nk,
      |    CAST(sum(CASE WHEN b.rev < a.rev
      |      OR (b.rev = a.rev AND b.nk < a.nk) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS r_rev,
      |    CAST(sum(CASE WHEN b.cnt < a.cnt
      |      OR (b.cnt = a.cnt AND b.nk < a.nk) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS r_cnt
      |  FROM nat a CROSS JOIN nat b
      |  GROUP BY 1
      |), sp AS (
      |  SELECT count(*) AS n,
      |    CAST(sum((r_rev - r_cnt) * (r_rev - r_cnt)) AS BIGINT) AS sum_d2
      |  FROM ranked
      |), kd AS (
      |  SELECT
      |    CAST(sum(CASE WHEN (a.rev - b.rev) * (a.cnt - b.cnt) > 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
      |    CAST(sum(CASE WHEN (a.rev - b.rev) * (a.cnt - b.cnt) < 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
      |    CAST(sum(CASE WHEN a.rev = b.rev OR a.cnt = b.cnt
      |      THEN 1 ELSE 0 END) AS BIGINT) AS tied_pairs
      |  FROM nat a JOIN nat b ON a.nk < b.nk
      |)
      |SELECT n, sum_d2,
      |  CAST(1000000 - CAST(6 AS HUGEINT) * sum_d2 * 1000000
      |    // (CAST(n AS HUGEINT) * (n * n - 1)) AS BIGINT) AS spearman_ppm,
      |  concordant, discordant, tied_pairs,
      |  CAST((CAST(concordant AS HUGEINT) - discordant) * 1000000
      |    // (CAST(n AS HUGEINT) * (n - 1) // 2) AS BIGINT) AS tau_ppm
      |FROM sp CROSS JOIN kd""".stripMargin

  val q242Oracle: String = {
    def one(table: String, c: String): String =
      s"""SELECT '$table' AS table_name, '$c' AS col_name,
         |  CAST(sum(cnt) AS BIGINT) AS n, count(*) AS n_distinct,
         |  CAST((CAST(sum(cnt) AS HUGEINT) * sum(cnt)
         |    - sum(CAST(cnt AS HUGEINT) * cnt)) * 1000000
         |    // (CAST(sum(cnt) AS HUGEINT) * sum(cnt)) AS BIGINT)
         |    AS gini_ppm,
         |  CAST(CAST(max(cnt) AS HUGEINT) * 1000000 // sum(cnt) AS BIGINT)
         |    AS top_share_ppm
         |FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS cnt
         |      FROM $table GROUP BY 1)""".stripMargin
    Q242Cols.map { case (t, c) => one(t, c) }.mkString("\nUNION ALL\n")
  }
}
