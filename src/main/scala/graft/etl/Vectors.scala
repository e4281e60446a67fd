package graft.etl

import org.apache.spark.ml.feature.Word2VecModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Vectors step: export the fitted model's vector table with entity
  * categories and L2 norms (capability-parity rebuild of reference
  * Vectors.scala).
  *
  * The reference computes the norm with a Scala UDF over the ML Vector
  * UDT (Vectors.scala:33); here the vector is converted to
  * `array<double>` first and the norm is a codegen'd fold
  * (graft.functions.VectorOps.l2Norm) — no UDF, no UDT serialization.
  */
object Vectors {

  /** (category, word, norm, vector) — category from the entity-ID prefix
    * (ENSG → target, CHEMBL → drug, otherwise disease;
    * reference Vectors.scala:27–35).
    */
  def compute(vectors: DataFrame): DataFrame =
    vectors
      .withColumn("vector", vector_to_array(col("vector")))
      .select(
        when(col("word").startsWith("ENSG"), "target")
          .when(col("word").startsWith("CHEMBL"), "drug")
          .otherwise("disease").as("category"),
        col("word"),
        VectorOps.l2Norm(col("vector")).as("norm"),
        col("vector"))

  def fromModel(model: Word2VecModel): DataFrame = compute(model.getVectors)

  /** Top-k nearest entities to `entityId` in the embedding space —
    * the model's downstream query capability (MLlib findSynonyms:
    * cosine-ranked over the vocabulary).
    */
  def synonyms(model: Word2VecModel, entityId: String, k: Int): DataFrame =
    model.findSynonyms(entityId, k)
      .withColumnRenamed("word", "entityId")
}
