package graft.core

import org.apache.spark.sql.types._

/** Declared layer schemas, used for validation only (the runtime schemas are
  * derived from the expression plans, exactly like the reference).
  *
  * Reference: src/utils/schema_definitions.py:5-64.
  */
object GhcnSchemas {

  val StationSchema: StructType = StructType(Seq(
    StructField("ID", StringType, nullable = false),
    StructField("LATITUDE", DoubleType),
    StructField("LONGITUDE", DoubleType),
    StructField("ELEVATION", DoubleType),
    StructField("STATE", StringType),
    StructField("NAME", StringType),
    StructField("COUNTRY", StringType)
  ))

  val BronzeSchema: StructType = StructType(Seq(
    StructField("ID", StringType, nullable = false),
    StructField("DATE", DateType, nullable = false),
    StructField("ELEMENT", StringType, nullable = false),
    StructField("VALUE", IntegerType),
    StructField("MFLAG", StringType),
    StructField("QFLAG", StringType),
    StructField("SFLAG", StringType),
    StructField("year", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false)
  ))

  val SilverSchema: StructType = StructType(Seq(
    StructField("ID", StringType, nullable = false),
    StructField("DATE", DateType, nullable = false),
    StructField("LATITUDE", DoubleType),
    StructField("LONGITUDE", DoubleType),
    StructField("ELEVATION", DoubleType),
    StructField("STATE", StringType),
    StructField("NAME", StringType),
    StructField("TMAX", DoubleType),
    StructField("TMIN", DoubleType),
    StructField("PRCP", DoubleType),
    StructField("SNOW", DoubleType),
    StructField("SNWD", DoubleType),
    StructField("year", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("data_quality_score", DoubleType)
  ))

  /** Validation-only schema; intentionally narrower than the 28-column
    * monthly table actually produced (the reference's declared gold schema
    * is partially stale — see schema_definitions.py:47-64 vs
    * notebooks/logs/04.output:66-94). Kept for behavioural parity.
    */
  val GoldMonthlySchema: StructType = StructType(Seq(
    StructField("ID", StringType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("LATITUDE", DoubleType),
    StructField("LONGITUDE", DoubleType),
    StructField("ELEVATION", DoubleType),
    StructField("STATE", StringType),
    StructField("avg_temp", DoubleType),
    StructField("min_temp", DoubleType),
    StructField("max_temp", DoubleType),
    StructField("total_precip", DoubleType),
    StructField("avg_snow", DoubleType),
    StructField("max_snow_depth", DoubleType),
    StructField("days_with_precip", IntegerType),
    StructField("days_with_snow", IntegerType),
    StructField("record_count", IntegerType)
  ))
}
