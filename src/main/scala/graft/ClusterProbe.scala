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

    // FUSED variant: two full rounds (prop+jump twice) per checkpoint +
    // observation job — halves per-round fixed cost (job submission,
    // checkpoint materialization) at ~2x plan depth per job. Output must
    // be identical (monotone min-label fixpoint; an extra trailing round
    // after convergence is a no-op).
    time("fused 2-round loop") {
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
          // half-round 1 (prev0 threaded through so the convergence count
          // never needs a re-join against the round's starting table)
          val prop1 = edges.join(frontier.select(col("doc_id").as("src"), col("label")), "src")
            .groupBy(col("dst").as("doc_id"))
            .agg(min(col("label")).as("nlabel"))
          val jump1 = labels.select(col("doc_id").as("label"), col("label").as("plabel"))
          val r1 = labels.join(prop1, Seq("doc_id"), "left")
            .join(jump1, Seq("label"), "left")
            .select(col("doc_id"),
              least(col("label"),
                coalesce(col("nlabel"), col("label")),
                coalesce(col("plabel"), col("label"))).as("l1"),
              col("label").as("prev0"))
          // half-round 2 over the in-plan l1 table
          val f1 = r1.filter(col("l1") =!= col("prev0"))
            .select(col("doc_id").as("src"), col("l1").as("flabel"))
          val prop2 = edges.join(f1, Seq("src"))
            .groupBy(col("dst").as("doc_id"))
            .agg(min(col("flabel")).as("nlabel2"))
          val jump2 = r1.select(col("doc_id").as("l1"), col("l1").as("plabel2"))
          val next = r1.join(prop2, Seq("doc_id"), "left")
            .join(jump2, Seq("l1"), "left")
            .select(col("doc_id"),
              least(col("l1"),
                coalesce(col("nlabel2"), col("l1")),
                coalesce(col("plabel2"), col("l1"))).as("nextLabel"),
              col("prev0").as("prevLabel"))
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
          println(f"[probe] fused round $iter: checkpoint ${(t1 - t0) / 1e9}%.2f s, " +
            f"count ${(t2 - t1) / 1e9}%.2f s, changed = $changed")
        }
        val diff = labels.select(col("doc_id"), col("label").as("canonical_id"))
          .exceptAll(clus).count() +
          clus.exceptAll(labels.select(col("doc_id"), col("label").as("canonical_id"))).count()
        println(s"[probe] fused output diff vs clusters() = $diff")
      }
    }

    // UNION variant: one round = union of three keyed streams (self,
    // neighbor-prop, jump) into a SINGLE groupBy(doc_id) min — 3
    // exchanges per round instead of 4 (prop's own groupBy and the
    // two-join chain collapse; partial min still combines map-side on
    // every union leg). Output must be identical per round: min over
    // the same three candidate sets.
    time("union 3-exchange loop") {
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
          val a = labels.select(col("doc_id"), col("label").as("l"),
            col("label").as("prev"))
          val b = edges.join(frontier.select(col("doc_id").as("src"), col("label")), "src")
            .select(col("dst").as("doc_id"), col("label").as("l"),
              lit(null).cast("long").as("prev"))
          val jumpside = labels.select(col("doc_id").as("label"), col("label").as("pl"))
          val c = labels.join(jumpside, Seq("label"))
            .select(col("doc_id"), col("pl").as("l"), lit(null).cast("long").as("prev"))
          val next = a.unionByName(b).unionByName(c)
            .groupBy(col("doc_id"))
            .agg(min(col("l")).as("nextLabel"), max(col("prev")).as("prevLabel"))
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
          println(f"[probe] union round $iter: checkpoint ${(t1 - t0) / 1e9}%.2f s, " +
            f"count ${(t2 - t1) / 1e9}%.2f s, changed = $changed")
        }
        val diff = labels.select(col("doc_id"), col("label").as("canonical_id"))
          .exceptAll(clus).count() +
          clus.exceptAll(labels.select(col("doc_id"), col("label").as("canonical_id"))).count()
        println(s"[probe] union output diff vs clusters() = $diff")
      }
    }

    // DESERIALIZED-edges diagnostic: same loop, edge blocks stored as row
    // objects — isolates how much of the ~0.45 s/round floor is the
    // per-round decode of 1.5M serialized edge rows (the broadcast join
    // probes every edge row every round, even at frontier = 80).
    time("deserialized-edges loop") {
      val pairs = pairsCk
      graft.core.AqeHints.withTinyRowAdvisory(spark) {
        val edges = pairs.select(col("doc1").as("src"), col("doc2").as("dst"))
          .unionByName(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
          .distinct()
          .localCheckpoint(true)
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
          println(f"[probe] deser round $iter: checkpoint ${(t1 - t0) / 1e9}%.2f s, " +
            f"count ${(t2 - t1) / 1e9}%.2f s, changed = $changed")
        }
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
