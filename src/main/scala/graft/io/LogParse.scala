package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-format parsers (reference P1/P2) as pure column expressions.
  *
  * The CSV cases are handled natively by the csv datasource with a schema;
  * this covers the space-separated apache access log the reference parses
  * by hand (`gmall-network-flow/.../app/HotUrlApp.java:45-55`:
  * `split(" ")` + `SimpleDateFormat("dd/MM/yyyy:HH:mm:ss")`).
  */
object LogParse {

  /** Parse an apache-log line column into (ip, user_id, ts, method, url).
    * Fields 0,1,3,5,6 of the space-split line, event time from the
    * `dd/MM/yyyy:HH:mm:ss` pattern — same consumed fields as the
    * reference. Malformed lines yield nulls (filter downstream), never
    * exceptions — at scale a bad row must not kill the job.
    */
  def apacheLog(df: DataFrame, line: Column): DataFrame = {
    // try_element_at: short/garbage lines give nulls (ANSI element_at
    // throws on out-of-bounds, which would fail the whole job)
    val f = split(line, " ")
    df.select(
      try_element_at(f, lit(1)).as("ip"),
      try_element_at(f, lit(2)).as("user_id"),
      try_to_timestamp(try_element_at(f, lit(4)), lit("dd/MM/yyyy:HH:mm:ss")).as("ts"),
      try_element_at(f, lit(6)).as("method"),
      try_element_at(f, lit(7)).as("url"))
  }
}
