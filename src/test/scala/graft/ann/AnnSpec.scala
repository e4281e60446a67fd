package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retrieval-quality checks over the real embeddings table: IVF must
  * agree with brute force when the true neighbor shares the query's cell.
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  "bruteForceKnn" should "return k ranked neighbors excluding the query" in {
    val knn = Ann.bruteForceKnn(emb, emb.filter(col("vec_id") < 3), k = 5).cache()
    knn.groupBy("query_id").count().as[(Long, Long)].collect().foreach(_._2 shouldBe 5L)
    knn.filter(col("query_id") === col("neighbor_id")).count() shouldBe 0
    // ranks are 1..5 and similarity is non-increasing in rank
    val sims = knn.filter(col("query_id") === 0).orderBy("rank")
      .select("sim").as[Double].collect()
    sims.toSeq shouldBe sims.sortBy(-_).toSeq
  }

  "ivfSearch" should "match brute force whenever the true top-1 is in the query's cell" in {
    val brute = Ann.bruteForceKnn(emb, emb.filter(col("vec_id") < 10), k = 1)
      .select(col("query_id"), col("neighbor_id").as("true_top"))
    val labels = emb.select(col("vec_id"), col("label"))
    val ivf = Ann.ivfSearch(emb, "label", emb.filter(col("vec_id") < 10), k = 1)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("ivf_top"), col("cell"))

    val joined = brute
      .join(labels.select(col("vec_id").as("true_top"), col("label").as("true_label")), "true_top")
      .join(ivf, "query_id")
    // when the true neighbor lives in the probed cell, IVF finds it
    val comparable = joined.filter(col("true_label") === col("cell"))
    comparable.count() should be > 0L
    comparable.filter(col("ivf_top") =!= col("true_top")).count() shouldBe 0
  }

  "lshPairs" should "only pair vectors from the same bucket and respect the floor" in {
    val pairs = Ann.lshPairs(emb, bits = 8, minSim = 0.2).cache()
    pairs.filter(col("sim") < 0.2).count() shouldBe 0
    val coded = emb.select(col("vec_id"), Ann.signBucket(col("embedding"), 8).as("b"))
    val check = pairs
      .join(coded.select(col("vec_id").as("id1"), col("b").as("b1")), "id1")
      .join(coded.select(col("vec_id").as("id2"), col("b").as("b2")), "id2")
    check.filter(col("b1") =!= col("b2")).count() shouldBe 0
  }
}
