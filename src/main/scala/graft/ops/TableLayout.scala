package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout preparation for the two canonical 100 TB I/O-elimination
  * techniques that are WRITE-side decisions, complementing the read-side
  * layout family (layout_zorder's clustering audit, layout_compaction_plan's
  * small-file planner):
  *
  *  - '''Bucketed tables''' ([[bucketedPair]]): both fact tables are written
  *    `bucketBy(n, joinKey)` + `sortBy(joinKey)`, so every future join on
  *    that key is satisfied by the scan's own `HashPartitioning` — the
  *    sort-merge join runs with ZERO shuffle exchanges (pinned at the
  *    physical-plan level in PlanInvariantsSpec). At 100 TB this is the
  *    difference between re-shuffling both fact tables per join (the
  *    dominant cost of a fact-fact join) and a pure co-located merge; the
  *    bucket count is the cluster-parallelism knob (8 here, thousands on a
  *    real cluster — one bucket's data must fit an executor's stream-side
  *    merge buffer).
  *
  *  - '''Partitioned tables''' ([[partitionedEvents]]): the event stream is
  *    written `partitionBy(event_date)`, so a date-bounded query prunes to
  *    the matching directories at PLANNING time — the scan never opens, or
  *    even lists, the other ~27/30 of the corpus (pinned via
  *    `FileSourceScanExec.selectedPartitions` in PlanInvariantsSpec). This
  *    is the lakehouse time-partitioning contract that makes "last 3 days
  *    of a year-long 100 TB stream" an O(3 days) scan.
  *
  * Both layouts are deterministic functions of the source dir, so they are
  * built ONCE per (JVM, source dir) and reused across query invocations
  * (Bench runs each query three times; the streaming staging caches set the
  * pattern — StreamingOps.stagedCorpus). Artifacts live in JVM temp dirs
  * removed by a shutdown hook; catalog table names are keyed by a hash of
  * the source dir so different scale dirs never collide.
  */
object TableLayout {

  private val builtBuckets =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private val builtPartitioned =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private val tmpDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]
  locally {
    val _ = sys.addShutdownHook {
      tmpDirs.forEach(graft.util.Fs.deleteRecursively(_))
    }
  }

  private def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Bucketed `(orders, lineitem)` catalog tables for `dir`, both
    * `bucketBy(nBuckets, orderkey)` + `sortBy` on external parquet paths.
    * The pre-write `repartition(nBuckets, key)` uses the SAME murmur3 hash
    * as the bucket-id assignment, so each task holds exactly one bucket and
    * each bucket is a single file — which lets the scan also satisfy the merge
    * join's SORT requirement from the sortBy metadata (one sorted file per
    * bucket needs no re-sort merge). Returns the two table names.
    */
  def bucketedPair(spark: SparkSession, dir: String, nBuckets: Int = 8): (String, String) =
    builtBuckets.computeIfAbsent(dir, _ => {
      val k = dirKey(dir)
      val ordersT = s"graft_bkt_orders_$k"
      val liT = s"graft_bkt_lineitem_$k"
      val base = java.nio.file.Files.createTempDirectory("graft_bucketed")
      tmpDirs.add(base)
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice"))
      orders.repartition(nBuckets, col("o_orderkey"))
        .write.mode("overwrite")
        .option("path", base.resolve("orders").toString)
        .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").saveAsTable(ordersT)
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
      li.repartition(nBuckets, col("l_orderkey"))
        .write.mode("overwrite")
        .option("path", base.resolve("lineitem").toString)
        .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").saveAsTable(liT)
      (ordersT, liT)
    })

  /** The co-located fact-fact join itself: lineitem ⋈ orders on the bucket
    * key, no exchange on either side. Runs on a child session with
    * broadcast disabled — a 150k-row orders side would otherwise broadcast,
    * which also avoids the shuffle but is exactly the strategy that STOPS
    * working at 100 TB (neither fact table fits the driver); the bucketed
    * merge is the one that scales. Conf is child-scoped per the repo rule
    * (never mutate the caller's session).
    */
  def bucketedJoin(outer: SparkSession, dir: String): DataFrame = {
    val (ordersT, liT) = bucketedPair(outer, dir)
    val s = outer.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.table(liT).join(s.table(ordersT),
      col("l_orderkey") === col("o_orderkey"))
  }

  /** `events` re-written `partitionBy(event_date)` (UTC calendar date of the
    * normalized timestamp), one directory per day. Returns the dataset path.
    */
  def partitionedEvents(spark: SparkSession, dir: String): String =
    builtPartitioned.computeIfAbsent(dir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft_part_events")
      tmpDirs.add(base)
      val out = base.resolve("events_by_date").toString
      graft.streaming.StreamingOps.events(spark, dir)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
      out
    })
}
