package graft

import org.apache.spark.sql.DataFrame

/** Shared helpers for the harness mains (Bench / Profile / Explain /
  * soak drivers).
  */
object Actions {

  /** Full-materialization action for timing or driving a query. A
    * `count()` compiles to `Aggregate[count(1)]` and ColumnPruning then
    * drops every deterministic projection expression — a map-only
    * operator (classifier, scrubber, packer) would be "executed" as a
    * bare parquet scan and its real per-row cost never measured. The
    * noop DSv2 sink consumes every row of every column, so the full
    * operator pipeline runs exactly as a real write would, minus the IO.
    */
  def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Locale-independent fixed-point formatting for JSON artifacts:
    * Scala's `"%.3f".format(v)` / f-interpolator use the default locale,
    * and a comma-decimal locale (e.g. de_DE) would silently emit invalid
    * JSON that fails the driver's `json.load` of the round artifact.
    */
  def fmt(v: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
}
