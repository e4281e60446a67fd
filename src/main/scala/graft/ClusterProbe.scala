package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 measurement tool (guide §1): decompose the d17-shaped cluster
  * queries into pair generation vs label-propagation rounds, print
  * per-phase seconds + rounds + edge counts so the loop's per-round cost
  * is a number, not a guess.
  */
object ClusterProbe {
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
    // d17's pair generation
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = graft.multimodal.ImageHash.syntheticGradientPngs(docs, spark, planted = true)
    val hashes = time("hashes (decode+checkpoint)") {
      graft.multimodal.ImageHash.dhashDocs(rows, spark, lenient = true).localCheckpoint(true)
    }
    val pairs = graft.dedup.Dedup.simhashPairs(hashes, bits = 64, maxHamming = 3)
    val pairsCk = time("pairs materialize") { pairs.localCheckpoint(true) }
    println(s"[probe] n_pairs = ${pairsCk.count()}")
    val (clus, rounds) = time("clusters() total") {
      graft.dedup.Dedup.clustersWithRounds(pairsCk, maxIter = 20)
    }
    println(s"[probe] rounds = $rounds")
    time("clusters result materialize") {
      clus.write.format("noop").mode("overwrite").save()
    }

    // 2-jump variant: label-of-label-of-label per round — distance to the
    // component min contracts ~4x per round instead of 2x; output must be
    // identical (monotone min-label fixpoint)
    time("two-jump loop") {
      val pairs = pairsCk
      graft.core.AqeHints.withTinyRowAdvisory(spark) {
        val edges = pairs.select(col("doc1").as("src"), col("doc2").as("dst"))
          .unionByName(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
          .distinct()
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        var labels = edges.select(col("src").as("doc_id")).distinct()
          .withColumn("label", col("doc_id"))
          .localCheckpoint()
        var checkpointed = labels
        var frontier = labels
        var iter = 0
        var changed = 1L
        while (changed > 0 && iter < 20) {
          val t0 = System.nanoTime()
          val prop = edges.join(frontier.select(col("doc_id").as("src"), col("label")), "src")
            .groupBy(col("dst").as("doc_id"))
            .agg(min(col("label")).as("nlabel"))
          val jump = labels
            .select(col("doc_id").as("label"), col("label").as("plabel"))
          val step1 = labels.join(prop, Seq("doc_id"), "left")
            .join(jump, Seq("label"), "left")
            .select(col("doc_id"),
              least(col("label"),
                coalesce(col("nlabel"), col("label")),
                coalesce(col("plabel"), col("label"))).as("l1"),
              col("label").as("prevLabel"))
          val jump2 = labels
            .select(col("doc_id").as("l1"), col("label").as("p2"))
          val next = step1.join(jump2, Seq("l1"), "left")
            .select(col("doc_id"),
              least(col("l1"), coalesce(col("p2"), col("l1"))).as("nextLabel"),
              col("prevLabel"))
            .localCheckpoint()
          val t1 = System.nanoTime()
          changed = next.filter(col("nextLabel") =!= col("prevLabel")).count()
          val t2 = System.nanoTime()
          graft.core.Checkpoints.unpersistCheckpoint(checkpointed)
          checkpointed = next
          labels = next.select(col("doc_id"), col("nextLabel").as("label"))
          frontier = next.filter(col("nextLabel") =!= col("prevLabel"))
            .select(col("doc_id"), col("nextLabel").as("label"))
          iter += 1
          println(f"[probe] 2j round $iter: checkpoint ${(t1 - t0) / 1e9}%.2f s, " +
            f"count ${(t2 - t1) / 1e9}%.2f s, changed = $changed")
        }
        val diff = labels.select(col("doc_id"), col("label").as("canonical_id"))
          .exceptAll(clus).count() +
          clus.exceptAll(labels.select(col("doc_id"), col("label").as("canonical_id"))).count()
        println(s"[probe] 2j output diff vs clusters() = $diff")
      }
    }

    // instrumented copy of the loop: where does a round's time go?
    time("instrumented loop") {
      val pairs = pairsCk
      graft.core.AqeHints.withTinyRowAdvisory(spark) {
        val edges = pairs.select(col("doc1").as("src"), col("doc2").as("dst"))
          .unionByName(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
          .distinct()
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        var labels = edges.select(col("src").as("doc_id")).distinct()
          .withColumn("label", col("doc_id"))
          .localCheckpoint()
        var checkpointed = labels
        var frontier = labels
        var iter = 0
        var changed = 1L
        while (changed > 0 && iter < 20) {
          val t0 = System.nanoTime()
          val prop = edges.join(frontier.select(col("doc_id").as("src"), col("label")), "src")
            .groupBy(col("dst").as("doc_id"))
            .agg(min(col("label")).as("nlabel"))
          val jump = labels
            .select(col("doc_id").as("label"), col("label").as("plabel"))
          val next = labels.join(prop, Seq("doc_id"), "left")
            .join(jump, Seq("label"), "left")
            .select(col("doc_id"),
              least(col("label"),
                coalesce(col("nlabel"), col("label")),
                coalesce(col("plabel"), col("label"))).as("nextLabel"),
              col("label").as("prevLabel"))
            .localCheckpoint()
          val t1 = System.nanoTime()
          changed = next.filter(col("nextLabel") =!= col("prevLabel")).count()
          val t2 = System.nanoTime()
          graft.core.Checkpoints.unpersistCheckpoint(checkpointed)
          checkpointed = next
          labels = next.select(col("doc_id"), col("nextLabel").as("label"))
          frontier = next.filter(col("nextLabel") =!= col("prevLabel"))
            .select(col("doc_id"), col("nextLabel").as("label"))
          iter += 1
          println(f"[probe] round $iter: checkpoint ${(t1 - t0) / 1e9}%.2f s, " +
            f"count ${(t2 - t1) / 1e9}%.2f s, changed = $changed")
        }
      }
    }
    spark.stop()
  }
}
