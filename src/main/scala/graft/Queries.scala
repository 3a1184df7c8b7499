package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator inventory (SURVEY.md §2) + LLM-pipeline extensions, each as a
  * named query over the driver's parquet tables with (where SQL-expressible)
  * a DuckDB-equivalent oracle statement.
  *
  * Determinism rules (the driver hash-compares values after sorting columns
  * by name): every aggregate is either integer-exact or routed through
  * DECIMAL casts so Spark and DuckDB sum identically; every query ends in an
  * explicit ORDER BY on a unique key; every computed column is aliased
  * identically on both sides.
  */
object Queries {

  private def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map()

  val oracles: Map[String, String] = Map()
}
