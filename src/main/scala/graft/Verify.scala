package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match Bench: queries share codegen'd fragments; the default
      // 100-entry janino cache can't hold one pass of this surface
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter (comma-separated names); driver sets no env
    // so its run always covers the full surface.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Output-typing contract (round 3, re-broken r10/r11): decimal128
    // final columns are hash-fragile on the driver's arrow stack — the
    // ONLY 4 red rows of r11 were exactly the 4 queries emitting
    // DecimalType. Reject them structurally so the class can't recur:
    // the offending query's parquet is never written (its row then
    // fails check.py as unreadable) and the run exits nonzero.
    import org.apache.spark.sql.types._
    def decimalCols(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f => decimalCols(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => decimalCols(a.elementType, s"$path[]")
      case m: MapType =>
        decimalCols(m.keyType, s"$path.key") ++
          decimalCols(m.valueType, s"$path.value")
      case _ => Nil
    }
    var nRejected = 0
    var nFailed = 0
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    // per-query outcome, written to outDir/run_manifest.json at the end:
    // a SCOPED rerun into a reused outDir leaves other queries' old
    // parquet in place, and without a manifest check.py happily
    // adjudicates the stale files (judge-reproduced r12 — 15:15-era
    // decimal dumps read as contract failures against code that no
    // longer produces them). The manifest names exactly what THIS run
    // produced; check.py scopes to it and calls everything else
    // "stale, ignored".
    val statuses = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = df.schema.fields.toSeq
          .flatMap(f => decimalCols(f.dataType, f.name))
        if (bad.nonEmpty) {
          nRejected += 1
          statuses(name) = "rejected"
          System.err.println(s"[verify] $name REJECTED: DecimalType output " +
            s"column(s) ${bad.mkString(", ")} — the no-DECIMAL-output " +
            "contract (integer-scale to BIGINT or CAST to STRING)")
          // also delete any STALE dump from a prior run in a reused
          // outDir — otherwise check.py would compare the old parquet
          // and could pass, silently masking the rejection
          rm(new java.io.File(s"$outDir/$name"))
        } else {
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          statuses(name) = "written"
        }
      }
      catch { case e: Throwable =>
        // same gate strength as the rejection path (ADVICE r12: a
        // crashed query must not exit 0, and its stale dump from a
        // prior run must not silently stand in for it)
        nFailed += 1
        statuses(name) = "failed"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        rm(new java.io.File(s"$outDir/$name"))
      }
      // self-join queries persist their shared inputs; drop them so one
      // query's cache never outlives its run
      finally spark.catalog.clearCache()
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
    val manifest = statuses
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/run_manifest.json"),
      s"""{"sf": ${q(sfDir)}, "scoped": ${only.isDefined}, "queries": $manifest}""")
    spark.stop()
    // nonzero AFTER the full dump (one bad query must not zero the rest
    // of the artifact — the r9 lesson), but loud enough that no decimal
    // or crashing query survives the pre-commit gate
    if (nRejected > 0 || nFailed > 0) {
      System.err.println(s"[verify] $nRejected quer(ies) rejected for " +
        s"DecimalType output, $nFailed threw — fix before committing")
      sys.exit(2)
    }
  }
}
