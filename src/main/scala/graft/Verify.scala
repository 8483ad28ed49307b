package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query-name filter — local
    // debugging aid; the driver always runs the full set]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    // Default matches the DRIVER's local[32]: rounds 10-11 both shipped a
    // red that only reproduced at high core counts (split sizing depends
    // on defaultParallelism) because local verification ran at 4 CPUs.
    // Override with SPARK_GRAFT_CPUS for quick low-core debug runs.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A gate that throws must surface as a RED row, not a silent absence:
    // round 6 shipped a crashing query and the correctness artifact simply
    // had no row for it. Collect failures into _errors.json so the compare
    // script (and the judge) can distinguish "errored" from "missing".
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Output-portability guard (r13 verdict item 3): the driver's
        // pandas oracle harness cannot sort top-level array/struct/map
        // columns (t47's TypeError: unhashable numpy.ndarray). Fail the
        // gate fast, with the stringify recipe, instead of letting a
        // non-portable schema reach the driver.
        val bad = df.schema.fields.filter(f => f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType
             | _: org.apache.spark.sql.types.StructType
             | _: org.apache.spark.sql.types.MapType => true
          case _ => false
        })
        if (bad.nonEmpty)
          throw new IllegalStateException(
            s"non-portable output columns ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}" +
            " — stringify with concat_ws(' ', col) (Spark) / array_to_string(..., ' ') (oracle)")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}".take(500)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    spark.stop()
    // loud but exit-0: the driver must still run the DuckDB compare on the
    // queries that DID produce output (a nonzero exit could discard them)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries THREW: ${errors.keys.mkString(", ")}")
  }
}
