package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Q.t

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata travelling beside them. The decode/feature-extract
  * kernels live in graft.multimodal (mapPartitions over a typed Dataset
  * with a stubbed decoder — the real image/audio libs aren't in this
  * container); the queries here prove the relational side — binary
  * construction, byte-length/hash metadata, deterministic chunk sampling —
  * against the oracle.
  *
  * The `documents` text is ASCII by construction, so utf8-encode is
  * byte-exact in both engines.
  */
object MultimodalQueries {

  /** Binary payload metadata: byte length, content hash, and a "thumbnail"
    * hash over a fixed-offset sample — the shape of image-metadata
    * extraction without the codec. All codegen'd; the binary column never
    * leaves the JVM.
    */
  val blobMeta: Q = Q(
    "m1_blob_meta",
    """SELECT doc_id, length(text) AS n_bytes, md5(text) AS blob_md5,
      |  md5(substr(text, 1, 16)) AS thumb_md5
      |FROM documents""".stripMargin) { (s, dir) =>
    val blob = col("text").cast("binary")
    t(s, dir, "documents").select(
      col("doc_id"),
      length(blob).as("n_bytes"),
      md5(blob).as("blob_md5"),
      md5(substring(blob, 1, 16)).as("thumb_md5"))
  }

  /** Fixed-size chunking of a binary payload (frame-sampling shape):
    * explode each blob into 64-byte chunks with (doc_id, chunk_no, hash).
    * The explode is map-side; downstream shuffles see only (id, no, hash).
    */
  val blobChunks: Q = Q(
    "m2_blob_chunks",
    """SELECT doc_id, CAST(i AS INT) AS chunk_no,
      |  md5(substr(text, (i - 1) * 64 + 1, 64)) AS chunk_md5
      |FROM (SELECT doc_id, text, unnest(range(1, CAST(ceil(length(text) / 64.0) AS BIGINT) + 1)) AS i
      |      FROM documents)""".stripMargin) { (s, dir) =>
    val nChunks = ceil(length(col("text")) / 64.0).cast("int")
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"), explode(sequence(lit(1), nChunks)).as("i"))
      .select(
        col("doc_id"),
        col("i").as("chunk_no"),
        md5(col("text").substr(lit(1) + (col("i") - 1) * 64, lit(64)).cast("binary")).as("chunk_md5"))
  }

  val all: Seq[Q] = Seq(blobMeta, blobChunks)
}
