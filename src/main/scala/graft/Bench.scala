package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query and
  * total wall seconds.
  *
  * Each query runs SPARK_GRAFT_REPS times (default 2) and reports the
  * fastest rep: single cold runs are dominated by per-query codegen /
  * JIT and by host-noise spikes (observed 4-10× swings on an idle
  * box), so min-of-2 is the stable, comparable-across-rounds number.
  * Dev extra: pass query names as args to restrict the set.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries
    // deterministic execution order; a tiny warmup query absorbs
    // one-time session costs (codegen bootstrap, parquet footer cache)
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      var best = Double.MaxValue
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        try {
          // noop sink: materializes every output column (a bare count()
          // lets Catalyst prune projection expressions away, so
          // select-only scalar-function queries would measure ~nothing)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => () }
      }
      // any successful rep counts; -1 only when EVERY rep failed
      name -> (if (best == Double.MaxValue) -1.0 else best)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries are excluded from the total (and visible as -1 entries)
    val total = results.map(_._2).filter(_ >= 0.0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // also persist the line so the driver never has to scrape sbt logs
    try {
      val p = java.nio.file.Paths.get("BENCH.json")
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
