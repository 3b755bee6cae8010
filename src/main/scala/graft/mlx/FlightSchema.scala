package graft.mlx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Declared schemas for the flight dataset and plane dimension
  * (FIXTURES.md §1-2) — the engine-mode alternative to
  * `FlightPipeline.readStringly`: types at the source, so scans prune
  * and filters push down on typed columns, and `"NA"` sentinels become
  * nulls during parsing (permissive mode) instead of surviving as
  * strings to be cast later (the reference's all-string approach,
  * `Main.scala:59,216-222`).
  */
object FlightSchema {

  private def i(n: String) = StructField(n, IntegerType)
  private def s(n: String) = StructField(n, StringType)

  /** 29 columns, variable-descriptions.csv:4-32 (reference). */
  val flights: StructType = StructType(Seq(
    i("Year"), i("Month"), i("DayofMonth"), i("DayOfWeek"),
    i("DepTime"), i("CRSDepTime"), i("ArrTime"), i("CRSArrTime"),
    s("UniqueCarrier"), s("FlightNum"), s("TailNum"),
    i("ActualElapsedTime"), i("CRSElapsedTime"), i("AirTime"),
    i("ArrDelay"), i("DepDelay"), s("Origin"), s("Dest"), i("Distance"),
    i("TaxiIn"), i("TaxiOut"), i("Cancelled"), s("CancellationCode"),
    i("Diverted"), i("CarrierDelay"), i("WeatherDelay"), i("NASDelay"),
    i("SecurityDelay"), i("LateAircraftDelay")))

  /** plane-data.csv: 9 columns; `year` kept as string (dropped anyway). */
  val planes: StructType = StructType(Seq(
    s("tailnum"), s("type"), s("manufacturer"), s("issue_date"),
    s("model"), s("status"), s("aircraft_type"), s("engine_type"),
    s("year")))

  /** Typed read: unparseable cells (e.g. "NA" in int columns) become
    * null in PERMISSIVE mode — the try_cast semantics SURVEY §1.3 asks
    * for, without a post-hoc cast pass. */
  def readFlights(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(flights)
      .option("header", "true").option("mode", "PERMISSIVE")
      .csv(path)

  def readPlanes(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(planes)
      .option("header", "true").option("mode", "PERMISSIVE")
      .csv(path)
}
