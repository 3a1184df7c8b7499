package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.disagg.Disaggregate

/** Drives the DataFrame-level API end-to-end, including the reference's CSV
  * source shape (A1: R-export CSVs with an unnamed index column) read through
  * Spark's CSV reader rather than a test-side loader.
  */
class SparkApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("denton golden through spark.read.csv + Disaggregate.series") {
    val url = getClass.getResource("/tsdisagg/sales_a.csv")
    // A1: header `"","x"` — column 0 is a 1-based R row index
    val csv = spark.read.option("header", "true").csv(url.toString)
      .select(col("_c0").cast(IntegerType).as("idx"),
        col("x").cast(DoubleType).as("sales"))
    // attach the YS index the reference tests attach (1975-01-01, yearly)
    val low = csv.select(
      (unix_micros(to_timestamp(lit("1975-01-01"))) +
        (col("idx") - 1).cast(LongType) * lit(0L)).as("dummy"),
      col("idx"), col("sales"))
      .withColumn("ts", to_timestamp(
        concat((lit(1974) + col("idx")).cast(StringType), lit("-01-01"))))
      .select(col("ts"), col("sales"))

    val out = Disaggregate.series(low, None,
      params = Disaggregate.Params(method = "denton", aggFunc = "sum"))
      .orderBy("ts").collect()

    val want = Fixtures.rValues("R_output_denton.csv")
    assert(out.length == want.length)
    Fixtures.assertAllClose(out.map(_.getDouble(1)), want, 1e-5, "spark csv denton")
  }

  test("series and manySeries agree on the same single series") {
    val dir = "/root/testdata/sf0.001"
    val low = spark.read.parquet(s"$dir/orders.parquet")
      .where(year(col("o_orderdate")) < 2001)
      .groupBy(date_trunc("year", col("o_orderdate")).as("ts"))
      .agg(sum("o_totalprice").as("revenue"))
    val single = Disaggregate.series(low, None,
      params = Disaggregate.Params(method = "denton-cholette", targetFreq = Some("QS")))
      .orderBy("ts").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getDouble(1)))
    val keyed = low.withColumn("series_id", lit(7L))
      .select(col("series_id"), col("ts"), col("revenue").as("value"))
    val many = Disaggregate.manySeries(keyed, None,
      params = Disaggregate.Params(method = "denton-cholette", targetFreq = Some("QS")))
      .orderBy("ts").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1), r.getDouble(2)))
    assert(single.length == many.length && single.nonEmpty)
    single.zip(many).foreach { case ((t1, v1), (t2, v2)) =>
      assert(t1 == t2)
      assert(math.abs(v1 - v2) < 1e-9)
    }
  }

  test("manySeries skips poisoned series instead of failing the job") {
    import spark.implicits._
    // series 1: 5 clean years; series 2: a single observation (the kernel
    // cannot infer a frequency from one point -> must be skipped, not fatal)
    val good = (0 until 5).map(i => (1L, java.sql.Timestamp.valueOf(s"${2000 + i}-01-01 00:00:00"), 100.0 + i))
    val bad = Seq((2L, java.sql.Timestamp.valueOf("2000-01-01 00:00:00"), 50.0))
    val low = (good ++ bad).toDF("series_id", "ts", "value")
    // skips must be observable, not silent: the accumulator counts exactly
    // the one poisoned series while the good series' output stays intact
    val skipped = spark.sparkContext.longAccumulator("test.manySeries.skipped")
    val out = Disaggregate.manySeries(low, None,
      params = Disaggregate.Params(method = "denton-cholette", targetFreq = Some("QS")),
      skippedSeries = Some(skipped))
      .collect()
    val bySeries = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(bySeries == Map(1L -> 20), s"expected only series 1 (5y x 4q), got $bySeries")
    assert(skipped.value == 1L, s"skipped-series accumulator: ${skipped.value}")
  }

  test("non-UTC session timezone does not shift disaggregation dates") {
    // the NTZ routing keeps wall-clock dates: before it, collected
    // java.sql.Timestamps were re-interpreted in UTC and every date in a
    // UTC+14 session shifted back a day (corrupting calendar period keys)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati") // UTC+14
      val dir = "/root/testdata/sf0.001"
      val low = spark.read.parquet(s"$dir/orders.parquet")
        .groupBy(date_trunc("year", col("o_orderdate")).as("ts"))
        .agg(sum("o_totalprice").as("revenue"))
      val out = Disaggregate.series(low, None,
        params = Disaggregate.Params(method = "denton-cholette", targetFreq = Some("QS")))
        .orderBy("ts").collect()
      val dates = out.map(_.getAs[java.time.LocalDateTime](0).toLocalDate)
      assert(dates.nonEmpty &&
        dates.forall(d => Set(1, 4, 7, 10)(d.getMonthValue) && d.getDayOfMonth == 1),
        s"quarter starts shifted: ${dates.take(4).mkString(",")}")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("agg_func variants roll up correctly (mean / first / last)") {
    val dir = "/root/testdata/sf0.001"
    val low = spark.read.parquet(s"$dir/orders.parquet")
      .where(year(col("o_orderdate")) < 2001)
      .groupBy(date_trunc("year", col("o_orderdate")).as("ts"))
      .agg(avg("o_totalprice").as("avg_price"))
    for (aggFunc <- Seq("mean", "first", "last")) {
      val out = Disaggregate.series(low, None,
        params = Disaggregate.Params(method = "denton-cholette",
          aggFunc = aggFunc, targetFreq = Some("QS")))
      val rolled = out.groupBy(year(col("ts")).as("y"))
        .agg(avg("avg_price").as("mean_v"),
          min_by(col("avg_price"), col("ts")).as("first_v"),
          max_by(col("avg_price"), col("ts")).as("last_v"))
      val joined = low.withColumn("y", year(col("ts"))).join(rolled, "y")
        .select(col("avg_price"), col("mean_v"), col("first_v"), col("last_v"))
        .collect()
      joined.foreach { r =>
        val want = r.getDouble(0)
        val got = aggFunc match {
          case "mean" => r.getDouble(1)
          case "first" => r.getDouble(2)
          case "last" => r.getDouble(3)
        }
        assert(math.abs(got - want) < 1e-6 * math.abs(want),
          s"$aggFunc: $got != $want")
      }
    }
  }
}
