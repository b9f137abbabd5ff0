package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query and
  * total wall seconds.
  *
  * Each query runs SPARK_GRAFT_REPS times (default 2) and reports the
  * fastest rep: single cold runs are dominated by per-query codegen /
  * JIT and by host-noise spikes (observed 4-10× swings on an idle
  * box), so min-of-2 is the stable, comparable-across-rounds number.
  *
  * Reps run as SEPARATED PASSES over the whole query list (rep 1 of
  * every query, then rep 2 of every query) rather than back-to-back:
  * a host-contention window shorter than a full pass (~75 s at sf0.1)
  * then lands on at most ONE rep of any query, and min-of-reps
  * discounts it — the same interleaving defense `dev/ab.py` applies
  * between code versions, applied inside the artifact itself. (The
  * r14 driver run had a mid-run window that inflated BOTH
  * back-to-back reps of q01 by 22×; pass separation makes that shape
  * impossible for windows narrower than a pass.) Min semantics are
  * unchanged: pass 1 absorbs per-query codegen exactly like rep 1
  * did, pass 2 runs warm.
  *
  * The artifact is self-defending against host contention: it records
  * EVERY rep time per query (`"reps"`), a fixed-cost CPU calibration
  * kernel timed at start and end (`"calibration"`), and the run's
  * total wall seconds next to the sum-of-mins — so a reader can
  * mechanically discount a contended run (calibration drifts, wall ≫
  * sum-of-mins, spiky rep arrays) instead of mistaking noise for a
  * regression.
  *
  * Dev extra: pass query names as args to restrict the set.
  */
object Bench {

  /** Fixed-cost, IO-free calibration kernel: hash-fold 20M longs.
    * Identical work every invocation — any run-to-run delta is the
    * host, not the engine.
    */
  private def calibrate(spark: SparkSession, reps: Int): Seq[Double] =
    (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, 8)
        .selectExpr("bit_xor(xxhash64(id)) AS s")   // xor-fold: ANSI-safe, can't overflow
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

  private def fmt(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // inert on the current timestamp[us] events fixture; lets the
      // same binary read pre-r9 TIMESTAMP(NANOS) fixtures as longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the library's deployment shape: analyzer/optimizer/strategy
      // injections active (SQL UPDATE/MERGE INTO need the rule)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // no-libhadoop hosts: stock local FS forks a `chmod`/`ls`
      // process per created/inspected file — pure driver latency on
      // every commit/write (guide §7.3). NIO-backed drop-in instead.
      .config("spark.hadoop.fs.file.impl",
        "graft.hadoop.NioLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.hadoop.NioLocalFs")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries
    // deterministic execution order; a tiny warmup query absorbs
    // one-time session costs (codegen bootstrap, parquet footer cache)
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val ordered = selected.toSeq.sortBy(_._1)
    // one DISCARDED warm rep of the first measured query: the first
    // timed execution of the run otherwise also pays shuffle-service /
    // scheduler bootstrap that no later query pays (VERDICT r14 #1)
    ordered.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case NonFatal(_) => () }
    }
    val calStart = calibrate(spark, 3)
    val wall0 = System.nanoTime()
    // rep passes over the WHOLE list (see class doc): times(name) grows
    // by one entry per pass, in pass order
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    ordered.foreach { case (name, _) => times(name) = Vector.empty }
    (0 until reps).foreach { _ =>
      ordered.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          // noop sink: materializes every output column (a bare count()
          // lets Catalyst prune projection expressions away, so
          // select-only scalar-function queries would measure ~nothing)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          times(name) :+= (System.nanoTime() - t0) / 1e9
        } catch { case NonFatal(_) => () }
      }
    }
    val results = ordered.map { case (name, _) =>
      val ts = times(name)
      // any successful rep counts; -1 only when EVERY rep failed
      (name, if (ts.isEmpty) -1.0 else ts.min, ts)
    }
    val wall = (System.nanoTime() - wall0) / 1e9
    val calEnd = calibrate(spark, 3)
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val repsJson = results.map { case (k, _, ts) =>
      "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val cal = s"""{"start":[${calStart.map(fmt).mkString(",")}],"end":[${calEnd.map(fmt).mkString(",")}]}"""
    // failed queries are excluded from the total (and visible as -1 entries)
    val total = results.map(_._2).filter(_ >= 0.0).sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","wall_sec":${fmt(wall)},"reps_n":$reps,"reps":$repsJson,"calibration":$cal}"""
    // also persist the line so the driver never has to scrape sbt logs
    try {
      val p = java.nio.file.Paths.get("BENCH.json")
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case NonFatal(_) => () }
    println(line)
    spark.stop()
  }
}
