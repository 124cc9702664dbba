package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{Dataset, Encoders}
import graft.SparkSpec

/** Kill–restart soak for the CUSTOM-state APIs (the s08 recovery
  * discipline, extended to s12/s13): run the stateful query against a
  * FILE source, stop it mid-stream, deliver more data while it is down,
  * restart a NEW query from the same checkpoint, and assert the combined
  * output equals the batch twin. This is the fault-tolerance contract a
  * 100 TB/day pipeline actually relies on — state (one open session per
  * user; a per-user ListState window) must be rebuilt from the
  * checkpointed state store, not recomputed from reprocessed input
  * (the file source does NOT replay committed files). */
class RestartSoakSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // one hour in us

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("s12 sessionTracker: custom session state survives a checkpointed " +
    "restart (flatMapGroupsWithState)") {
    val inDir = tmp("graft_soak_in")
    val ckpt = tmp("graft_soak_ckpt")
    val seen = scala.collection.mutable.ArrayBuffer[EventStream.Session]()
    def ev(u: Long, us: Long, cents: Long) =
      EventStream.SessEvent(u, us, cents, new java.sql.Timestamp(us / 1000L))
    def writeWave(rows: Seq[EventStream.SessEvent]): Unit =
      rows.toDS().write.mode("append").json(inDir)
    def start() = EventStream.sessionTracker(
      spark.readStream.schema(Encoders.product[EventStream.SessEvent].schema)
        .json(inDir).as[EventStream.SessEvent],
      gapUs = 1800000000L)
      .writeStream
      .foreachBatch { (batch: Dataset[EventStream.Session], _: Long) =>
        val rows = batch.collect()
        seen.synchronized { seen ++= rows }; ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val wave1 = Seq(ev(1L, H, 100L), ev(1L, H + 600000000L, 50L),
      ev(2L, 2 * H, 30L))
    val wave2 = Seq(ev(1L, 3 * H, 7L), ev(2L, 10 * H, 1L))
    try {
      val q1 = start()
      try { writeWave(wave1); q1.processAllAvailable() } finally q1.stop()
      // the pipeline is DOWN while wave 2 lands
      writeWave(wave2)
      val q2 = start()
      try {
        q2.processAllAvailable()
        val got = seen.synchronized(seen.toSet)
        // user 1's first session must merge ACROSS the restart (open
        // state recovered); 3H closes it; the 10H event advances the
        // watermark past 3H+gap so the second session timeout-flushes;
        // user 2's 2H session closes on its own 10H event
        assert(got == Set(
          EventStream.Session(1L, H, H + 600000000L, 2L, 150L),
          EventStream.Session(1L, 3 * H, 3 * H, 1L, 7L),
          EventStream.Session(2L, 2 * H, 2 * H, 1L, 30L)),
          s"restart-soak output mismatch: $got")
        // batch twin = the streamed sessions + the trailing OPEN session
        // the watermark has not yet flushed (user 2 at 10H)
        val twin = EventStream.sessionTracker((wave1 ++ wave2).toDS(),
          gapUs = 1800000000L, emitOpen = true).collect().toSet
        assert(twin == got + EventStream.Session(2L, 10 * H, 10 * H, 1L, 1L))
      } finally q2.stop()
    } finally { rmTree(new java.io.File(inDir)); rmTree(new java.io.File(ckpt)) }
  }

  test("s13 rollingFeature: ListState window survives a checkpointed " +
    "restart (transformWithState)") {
    val inDir = tmp("graft_soak13_in")
    val ckpt = tmp("graft_soak13_ckpt")
    // transformWithState needs the multi-column-family store in streaming
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    val seen = scala.collection.mutable.ArrayBuffer[EventStream.RollFeature]()
    def start() = EventStream.rollingFeature(
      spark.readStream.schema(Encoders.product[EventStream.RollEvent].schema)
        .json(inDir).as[EventStream.RollEvent], n = 3)
      .writeStream
      .foreachBatch { (batch: Dataset[EventStream.RollFeature], _: Long) =>
        val rows = batch.collect()
        seen.synchronized { seen ++= rows }; ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val wave1 = Seq(EventStream.RollEvent(1L, 1L, 1000L, 10L),
      EventStream.RollEvent(1L, 2L, 2000L, 20L))
    val wave2 = Seq(EventStream.RollEvent(1L, 3L, 3000L, 40L),
      EventStream.RollEvent(1L, 4L, 4000L, 80L),
      EventStream.RollEvent(2L, 5L, 1000L, 7L))
    try {
      val q1 = start()
      try {
        wave1.toDS().write.mode("append").json(inDir)
        q1.processAllAvailable()
      } finally q1.stop()
      wave2.toDS().write.mode("append").json(inDir)
      val q2 = start()
      try {
        q2.processAllAvailable()
        val got = seen.synchronized(seen.toSet)
        // event 3's feature must see events 1+2 from RECOVERED ListState:
        // n_prev=2/sum=30 proves the window crossed the restart (a fresh
        // store would emit 0/0); event 4 sees 1..3 (window n=3)
        val twin = EventStream.rollingFeature((wave1 ++ wave2).toDS(), n = 3)
          .collect().toSet
        assert(got == twin, s"restart-soak output mismatch: $got vs $twin")
        assert(got.contains(EventStream.RollFeature(1L, 3L, 2L, 30L)))
        assert(got.contains(EventStream.RollFeature(1L, 4L, 3L, 70L)))
      } finally q2.stop()
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      rmTree(new java.io.File(inDir)); rmTree(new java.io.File(ckpt))
    }
  }

  test("sessionTracker survives late out-of-order events (operator drops " +
    "them; the timeout clamp covers the exact-boundary case)") {
    // Pinned semantics (verified empirically on this Spark): with a
    // watermark defined, flatMapGroupsWithState FILTERS late input rows
    // before the user function — a far-late event neither throws (the
    // pre-clamp failure mode would be "timeout timestamp <= watermark")
    // nor creates a session. The setTimeoutTimestamp clamp in
    // sessionTracker remains as insurance for the exact-at-watermark
    // boundary with sub-millisecond gaps, where ms-floor arithmetic
    // could otherwise still violate the strictly-greater requirement.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[EventStream.SessEvent]
    def ev(u: Long, us: Long) =
      EventStream.SessEvent(u, us, 1L, new java.sql.Timestamp(us / 1000L))
    val q = EventStream.sessionTracker(in.toDS(), gapUs = 1800000000L)
      .writeStream.format("memory").queryName("soak_late")
      .outputMode("append").start()
    try {
      // watermark (delay 0) advances to 10H after batch 1
      in.addData(ev(1L, 10 * H))
      q.processAllAvailable()
      // user 2's event is 8 hours late -> dropped by the operator
      in.addData(ev(2L, 2 * H))
      q.processAllAvailable()
      in.addData(ev(3L, 11 * H)) // advances the watermark; flushes user 1
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val got = spark.table("soak_late").as[EventStream.Session]
        .collect().toSet
      assert(got == Set(
        EventStream.Session(1L, 10 * H, 10 * H, 1L, 1L)),
        s"late event must be dropped, on-time session flushed: $got")
    } finally q.stop()
  }

  test("labelComponents: reliable-checkpoint branch — identical labels " +
    "with a checkpoint dir set, and blocks actually on disk") {
    // cluster-mode smoke (r17 verdict ask #7): when setCheckpointDir is
    // defined, each propagation round writes a RELIABLE checkpoint
    // (survives executor loss) instead of localCheckpoint's
    // executor-local blocks. Same labels, and the dir must be non-empty
    // proof the branch ran — a silent fallback to localCheckpoint
    // would leave it bare.
    import org.apache.spark.sql.functions.col
    val ckpt = tmp("graft_cc_ckpt")
    val nodes = (1L to 12L).toDF("doc")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L),
      (7L, 8L), (8L, 9L), (10L, 10L)).toDF("doc", "peer")
    val sym = pairs.unionByName(
      pairs.select(col("peer").as("doc"), col("doc").as("peer")))
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "precondition: suite session runs the local-checkpoint branch")
    sc.setCheckpointDir(ckpt)
    try {
      assert(sc.getCheckpointDir.isDefined)
      val got = graft.ops.Dedup.labelComponents(nodes, sym)
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
        (5L, 5L), (6L, 5L), (7L, 7L), (8L, 7L), (9L, 7L),
        (10L, 10L), (11L, 11L), (12L, 12L)), s"labels: $got")
      val wrote = new java.io.File(ckpt).listFiles
      assert(wrote != null && wrote.nonEmpty,
        "reliable-checkpoint branch wrote nothing to the checkpoint dir")
    } finally {
      // the shared SparkContext must leave this suite as it entered —
      // there is no public unset, so restore None reflectively
      val setter = sc.getClass.getMethods
        .find(_.getName == "checkpointDir_$eq").get
      setter.invoke(sc, None)
      rmTree(new java.io.File(ckpt))
    }
  }
}
