package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r11 measurement tool (guide §1): decompose the clusters() per-round
  * ~0.45 s fixed cost — the one wall three r11 structural probes could
  * not move (ClusterProbe: fused rounds, union rounds, storage level all
  * refuted). Hypotheses, each isolated here:
  *
  *   1. driver-side Catalyst work per round (analysis + optimization +
  *      physical planning + codegen of each round's fresh plan) —
  *      measured by forcing `queryExecution.executedPlan` separately
  *      from execution;
  *   2. AQE's materialize-replan-materialize stage loop latency —
  *      measured by running the identical loop with adaptive execution
  *      disabled for the loop's duration;
  *   3. task-launch width (shuffle.partitions tasks per stage at tiny
  *      data) — measured by a loop under a scoped tiny partition count;
  *   4. Catalyst per se — an RDD pointer-doubling loop (no SQL, no
  *      planning, no codegen) as the floor's lower bound. Not a product
  *      candidate as-is (Java-serialized Tuple2 rows shuffle ~5x the
  *      bytes of UnsafeRow at scale); it bounds what rounds COULD cost.
  */
object RoundFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // d17's pair generation (the densest cluster input in the registry)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = graft.multimodal.ImageHash.syntheticGradientPngs(docs, spark, planted = true)
    val hashes = graft.multimodal.ImageHash.dhashDocs(rows, spark, lenient = true)
      .localCheckpoint(true)
    val pairsCk = time("pairs materialize") {
      graft.dedup.Dedup.simhashPairs(hashes, bits = 64, maxHamming = 3).localCheckpoint(true)
    }
    println(s"[probe] n_pairs = ${pairsCk.count()}")
    val (clusRef, refRounds) = time("clusters() reference") {
      graft.dedup.Dedup.clustersWithRounds(pairsCk, maxIter = 20)
    }
    val refOut = clusRef.localCheckpoint(true)
    println(s"[probe] reference rounds = $refRounds")

    /** The exact clusters() loop with per-round phase decomposition.
      * `conf` key/values are scoped to the loop (saved/restored).
      */
    def decomposedLoop(tag: String, conf: Map[String, String]): Unit = {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        graft.core.AqeHints.withTinyRowAdvisory(spark) {
          val t0 = System.nanoTime()
          val edges = pairsCk.select(col("doc1").as("src"), col("doc2").as("dst"))
            .unionByName(pairsCk.select(col("doc2").as("src"), col("doc1").as("dst")))
            .distinct()
            .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
          var labels = edges.groupBy(col("dst").as("doc_id"))
            .agg(min(col("src")).as("nmin"))
            .select(col("doc_id"), least(col("doc_id"), col("nmin")).as("label"))
            .localCheckpoint()
          println(f"[probe] $tag init: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          var checkpointed = labels
          var frontier = labels.filter(col("label") =!= col("doc_id"))
          var iter = 0
          var changed = 1L
          while (changed > 0 && iter < 20) {
            val r0 = System.nanoTime()
            val prop = edges.join(frontier.select(col("doc_id").as("src"), col("label")), "src")
              .groupBy(col("dst").as("doc_id"))
              .agg(min(col("label")).as("nlabel"))
            val jump = labels
              .select(col("doc_id").as("label"), col("label").as("plabel"))
            val obs = org.apache.spark.sql.Observation(s"rfp_${tag}_$iter")
            val next = labels.join(prop, Seq("doc_id"), "left")
              .join(jump, Seq("label"), "left")
              .select(col("doc_id"),
                least(col("label"),
                  coalesce(col("nlabel"), col("label")),
                  coalesce(col("plabel"), col("label"))).as("nextLabel"),
                col("label").as("prevLabel"))
              .observe(obs, count(when(col("nextLabel") =!= col("prevLabel"), 1)).as("changed"))
            val r1 = System.nanoTime()
            // force analysis + optimization + physical planning (not execution)
            val _plan = next.queryExecution.executedPlan
            val r2 = System.nanoTime()
            val nextCk = next.localCheckpoint()
            val r3 = System.nanoTime()
            changed =
              try {
                val row = scala.concurrent.Await.result(obs.future,
                  scala.concurrent.duration.Duration(30, "s"))
                row.getAs[Long]("changed")
              } catch {
                case _: java.util.concurrent.TimeoutException =>
                  nextCk.filter(col("nextLabel") =!= col("prevLabel")).count()
              }
            val r4 = System.nanoTime()
            graft.core.Checkpoints.unpersistCheckpoint(checkpointed)
            checkpointed = nextCk
            labels = nextCk.select(col("doc_id"), col("nextLabel").as("label"))
            frontier = nextCk.filter(col("nextLabel") =!= col("prevLabel"))
              .select(col("doc_id"), col("nextLabel").as("label"))
            iter += 1
            println(f"[probe] $tag round $iter: build ${(r1 - r0) / 1e9}%.3f  " +
              f"plan ${(r2 - r1) / 1e9}%.3f  exec ${(r3 - r2) / 1e9}%.3f  " +
              f"obs ${(r4 - r3) / 1e9}%.3f  changed=$changed")
          }
          val diff = labels.select(col("doc_id"), col("label").as("canonical_id"))
            .exceptAll(refOut).count() +
            refOut.exceptAll(labels.select(col("doc_id"), col("label").as("canonical_id"))).count()
          println(s"[probe] $tag rounds=$iter diff_vs_reference=$diff")
          graft.core.Checkpoints.unpersistCheckpoint(edges)
          graft.core.Checkpoints.unpersistCheckpoint(checkpointed)
        }
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    // GRAFT_RFP_ONLY: comma-separated variant tags to run (default all)
    val onlyV = sys.env.get("GRAFT_RFP_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wants(tag: String): Boolean = onlyV.forall(_.contains(tag))

    // stage-level attribution (GRAFT_RFP_STAGES=1): print every completed
    // stage's task count and wall time so a round's serial stage chain is
    // visible — the empirical loop the guide §1.1 prescribes, without the UI
    if (sys.env.get("GRAFT_RFP_STAGES").contains("1")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"wall=${wall.getOrElse(-1L)}%4d ms  ${si.name.take(90)}")
        }
      })
    }

    if (wants("base")) time("decomposed loop (as shipped)") {
      decomposedLoop("base", Map.empty)
    }
    if (wants("noaqe")) time("decomposed loop (AQE off)") {
      decomposedLoop("noaqe", Map("spark.sql.adaptive.enabled" -> "false"))
    }
    if (wants("p4")) time("decomposed loop (4 shuffle partitions)") {
      decomposedLoop("p4", Map("spark.sql.shuffle.partitions" -> "4"))
    }
    if (wants("noaqe_p4")) time("decomposed loop (AQE off + 4 partitions)") {
      decomposedLoop("noaqe_p4", Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "4"))
    }

    // RDD pointer-doubling lower bound: no Catalyst anywhere in the loop.
    // CONTRACTION variant: run `warm` full rounds, then contract the graph
    // to its label quotient (edge (u,v) -> (l(u), l(v)), drop self-loops,
    // distinct) and finish the loop on the contracted graph; compose at the
    // end: out(v) = rep(l_warm(v)), coalescing labels whose component was
    // already converged at contraction (single-label components have no
    // contracted edges — and all-equal labels means the shared label is the
    // component min, since the min node's label is always itself).
    def contractLoop(tag: String, warm: Int): Unit = {
      graft.core.AqeHints.withTinyRowAdvisory(spark) {
        val t0 = System.nanoTime()
        val edges = pairsCk.select(col("doc1").as("src"), col("doc2").as("dst"))
          .unionByName(pairsCk.select(col("doc2").as("src"), col("doc1").as("dst")))
          .distinct()
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        var labels = edges.groupBy(col("dst").as("doc_id"))
          .agg(min(col("src")).as("nmin"))
          .select(col("doc_id"), least(col("doc_id"), col("nmin")).as("label"))
          .localCheckpoint()
        var iter = 1 // init absorbs round 1
        while (iter < warm) {
          val frontier = labels.filter(col("label") =!= col("doc_id"))
          val prop = edges.join(frontier.select(col("doc_id").as("src"), col("label")), "src")
            .groupBy(col("dst").as("doc_id"))
            .agg(min(col("label")).as("nlabel"))
          val jump = labels.select(col("doc_id").as("label"), col("label").as("plabel"))
          labels = labels.join(prop, Seq("doc_id"), "left")
            .join(jump, Seq("label"), "left")
            .select(col("doc_id"),
              least(col("label"),
                coalesce(col("nlabel"), col("label")),
                coalesce(col("plabel"), col("label"))).as("label"))
            .localCheckpoint()
          iter += 1
        }
        val t1 = System.nanoTime()
        val cEdges = edges
          .join(labels.select(col("doc_id").as("src"), col("label").as("ls")), "src")
          .join(labels.select(col("doc_id").as("dst"), col("label").as("ld")), "dst")
          .filter(col("ls") =!= col("ld"))
          .select(col("ls").as("doc1"), col("ld").as("doc2"))
          .distinct()
          .localCheckpoint(true)
        val nC = cEdges.count()
        val t2 = System.nanoTime()
        val (rep, crounds) = graft.dedup.Dedup.clustersWithRounds(cEdges, maxIter = 20)
        val out = labels
          .join(rep.withColumnRenamed("doc_id", "label"), Seq("label"), "left")
          .select(col("doc_id"),
            coalesce(col("canonical_id"), col("label")).as("canonical_id"))
        out.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val diff = out.exceptAll(refOut).count() + refOut.exceptAll(out).count()
        println(f"[probe] $tag: warm=${(t1 - t0) / 1e9}%.2f contract=${(t2 - t1) / 1e9}%.2f " +
          f"(n_cedges=$nC) rest=${(t3 - t2) / 1e9}%.2f total=${(t3 - t0) / 1e9}%.2f " +
          f"crounds=$crounds diff=$diff")
      }
    }
    if (wants("contract1")) time("contract after init") { contractLoop("contract1", 1) }
    if (wants("contract2")) time("contract after 2 rounds") { contractLoop("contract2", 2) }
    if (wants("contract3")) time("contract after 3 rounds") { contractLoop("contract3", 3) }

    if (wants("rdd")) time("rdd loop") {
      import org.apache.spark.HashPartitioner
      import org.apache.spark.rdd.RDD
      import org.apache.spark.storage.StorageLevel
      val p = new HashPartitioner(spark.sparkContext.defaultParallelism)
      val edgePairs = pairsCk.select(col("doc1"), col("doc2")).rdd
        .map(r => (r.getLong(0), r.getLong(1)))
      val edges: RDD[(Long, Long)] = edgePairs
        .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
        .distinct()
        .partitionBy(p)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      edges.count()
      // init absorbs round 1: labels(v) = min(v, min neighbor)
      var gen: RDD[(Long, (Long, Long))] = edges
        .reduceByKey(p, (a: Long, b: Long) => math.min(a, b))
        .mapPartitions(_.map { case (v, nmin) =>
          (v, (math.min(v, nmin), v)) }, preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      gen.count()
      def labelsOf(g: RDD[(Long, (Long, Long))]): RDD[(Long, Long)] =
        g.mapValues(_._1)
      def frontierOf(g: RDD[(Long, (Long, Long))]): RDD[(Long, Long)] =
        g.filter { case (_, (n, prev)) => n != prev }.mapValues(_._1)
      var iter = 0
      var changed = 1L
      while (changed > 0 && iter < 20) {
        val r0 = System.nanoTime()
        val labels = labelsOf(gen)
        val frontier = frontierOf(gen)
        val prop = edges.join(frontier)
          .map { case (_, (dst, l)) => (dst, l) }
          .reduceByKey(p, (a: Long, b: Long) => math.min(a, b))
        val jump = labels.map { case (v, l) => (l, v) }
          .join(labels)
          .map { case (_, (v, pl)) => (v, pl) }
          .reduceByKey(p, (a: Long, b: Long) => math.min(a, b))
        val next = labels.cogroup(prop, jump)
          .mapPartitions(_.map { case (v, (ls, ps, js)) =>
            val l = ls.head
            var m = l
            ps.foreach(x => if (x < m) m = x)
            js.foreach(x => if (x < m) m = x)
            (v, (m, l))
          }, preservesPartitioning = true)
          .persist(StorageLevel.MEMORY_AND_DISK)
        changed = next.filter { case (_, (n, prev)) => n != prev }.count()
        gen.unpersist(false)
        gen = next
        iter += 1
        println(f"[probe] rdd round $iter: ${(System.nanoTime() - r0) / 1e9}%.3f s changed=$changed")
      }
      val labels = labelsOf(gen)
      import spark.implicits._
      val out = labels.toDF("doc_id", "canonical_id")
      val diff = out.exceptAll(refOut).count() + refOut.exceptAll(out).count()
      println(s"[probe] rdd rounds=$iter diff_vs_reference=$diff")
      edges.unpersist(false)
      gen.unpersist(false)
    }
    spark.stop()
  }
}
