package graft

import graft.streaming.StreamingSessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only streaming scale probe (test scope, like ScaleGen/ProfileJac —
  * not part of the shipped library): drives the RocksDB-backed
  * sessionizer over a ScaleGen'd events table (10× users vs sf0.1),
  * kills the query mid-replay with sessions still open in the state
  * store, restarts from the checkpoint, and reports
  *
  *   - state-store rows/memory per micro-batch (from `StreamingQuery
  *     .recentProgress.stateOperators` — the metrics a cluster operator
  *     watches),
  *   - wall-clock to recover + finish after restart,
  *   - parity against the batch `session_window` plan over the same
  *     events: every emitted session must exist in the batch result
  *     (sessions newer than the final watermark are legitimately held
  *     back — reported, not counted as loss).
  *
  * Usage: sbt "Test/runMain graft.StreamScale /tmp/graft_sf1 [maxFilesPerTrigger] [native|tws]"
  * — `tws` drives [[graft.streaming.TwsSessionizer]] (ValueState +
  * explicit timers) through the same kill/restart/parity protocol.
  * Results are recorded in SCALE.md §5.
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val mft = args.lift(1).getOrElse("4")
    val flavor = args.lift(2).getOrElse("native")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_streamscale").toString
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Order the replay: range-partition by ts (part-NNNNN index == time
    // order) and stamp STRICTLY INCREASING mtimes in that order, because
    // FileStreamSource batches files by modification time — this makes
    // the stream replay the log in EVENT-TIME order (the Kafka-replay
    // analog). ScaleGen's random repartition(32) delivered whole files
    // out of time order and the watermark dropped them wholesale as late
    // (measured: 70% of the corpus discarded, 16.5k divergent sessions);
    // uniform mtimes were not enough (listing order is not path order).
    val ordered = s"$base/events_ordered"
    spark.read.parquet(s"$dir/events.parquet")
      .repartitionByRange(32, col("ts"))
      .write.parquet(ordered)
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(ordered))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val sortedParts = scala.jdk.CollectionConverters.IteratorHasAsScala(parts)
      .asScala.filter(_.getFileName.toString.startsWith("part-")).toSeq
      .sortBy(_.getFileName.toString)
    val t0ms = System.currentTimeMillis() - sortedParts.size * 1000L
    sortedParts.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t0ms + i * 1000L))
    }
    val rawSchema = spark.read.parquet(ordered).schema
    // eventsStream twin with bounded-rate replay (maxFilesPerTrigger) so
    // the run produces several micro-batches to kill between.
    def start() = {
      val src = graft.Tables.normalizeTs(
        spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", mft).parquet(ordered))
      val sessions = flavor match {
        case "tws" =>
          import spark.implicits._
          graft.streaming.TwsSessionizer.sessionize(
            src.select(col("event_id"), col("user_id"), col("ts"),
              col("value")).as[graft.streaming.StatefulSessionizer.Event]).toDF()
        case _ => StreamingSessions.sessionize(src)
      }
      sessions.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }

    def fmt(p: org.apache.spark.sql.streaming.StreamingQueryProgress): String = {
      val so = p.stateOperators.head
      f"batch=${p.batchId}%3d in=${p.numInputRows}%8d stateRows=${so.numRowsTotal}%8d " +
        f"stateMem=${so.memoryUsedBytes / 1024.0 / 1024.0}%7.1fMB"
    }

    // ---- phase 1: replay a bounded prefix, then kill mid-stream with
    // open sessions (watermark is behind the tail ⇒ state non-empty).
    val q1 = start()
    while (q1.recentProgress.count(_.numInputRows > 0) < 3 && q1.isActive)
      Thread.sleep(200)
    q1.stop()
    val p1 = q1.recentProgress.filter(_.stateOperators.nonEmpty)
    println("[streamscale] phase-1 batches (pre-kill):")
    p1.foreach(p => println("  " + fmt(p)))

    // ---- phase 2: restart from the checkpoint; recovery must restore the
    // open-session state before the first new batch commits.
    val t0 = System.nanoTime()
    val q2 = start()
    q2.processAllAvailable()
    val recoverS = (System.nanoTime() - t0) / 1e9
    q2.stop()
    val p2 = q2.recentProgress.filter(_.stateOperators.nonEmpty)
    println("[streamscale] phase-2 batches (post-restart):")
    p2.foreach(p => println("  " + fmt(p)))

    // ---- parity: the streamed sessions must be an exact SUBSET of the
    // batch sessions (same session boundaries and counts), with only the
    // in-watermark tail held back.
    val cols = Seq("user_id", "session_start", "session_end", "n_events")
    val streamed = spark.read.parquet(out).selectExpr(cols: _*)
    val batch = graft.operators.Sessionization.nativeSessions(
      Tables.events(spark, dir)).selectExpr(cols: _*)
    val nStream = streamed.count()
    val nBatch = batch.count()
    val divergent = streamed.exceptAll(batch).count()
    val all = p1 ++ p2
    val maxRows = if (all.isEmpty) -1L else all.map(_.stateOperators.head.numRowsTotal).max
    val maxMemMb = if (all.isEmpty) -1.0
      else all.map(_.stateOperators.head.memoryUsedBytes).max / 1024.0 / 1024.0
    println(f"""{"probe":"stream_scale","dir":"$dir","emitted":$nStream,""" +
      f""""batch_total":$nBatch,"divergent_sessions":$divergent,""" +
      f""""max_state_rows":$maxRows,"max_state_mb":$maxMemMb%.1f,""" +
      f""""recover_and_finish_sec":$recoverS%.1f}""")
    assert(divergent == 0, s"$divergent streamed sessions not found in batch result")
    spark.stop()
  }
}
