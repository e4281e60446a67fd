package graft.etl

import org.apache.spark.sql.types.StructType

/** Explicit schema for the raw EPMC JSON corpus (the shape the reference
  * ingests with inferred schema from its `processing.epmc` input,
  * reference.conf:59–62; field inventory from reference
  * Grounding.scala:318–360 and the co-occurrence branch at 258–304).
  *
  * Declared instead of inferred because JSON inference is a full pre-pass
  * over the input — at 100 TB a second scan of the corpus before the
  * first useful task runs (see Io scaladoc, core/Io.scala). An explicit
  * schema also lets the JSON parser skip fields the pipeline never reads.
  * `journal info` (space) and `co-occurrence` (hyphen) are the upstream
  * feed's literal field names.
  */
object EpmcSchema {

  val ddl: String =
    """pmid STRING,
      |pmcid STRING,
      |pubDate STRING,
      |organisms ARRAY<STRING>,
      |`journal info` STRUCT<name: STRING>,
      |sentences ARRAY<STRUCT<
      |  section: STRING,
      |  text: STRING,
      |  matches: ARRAY<STRUCT<
      |    label: STRING, type: STRING,
      |    startInSentence: BIGINT, endInSentence: BIGINT,
      |    sectionStart: BIGINT, sectionEnd: BIGINT>>,
      |  `co-occurrence`: ARRAY<STRUCT<
      |    label1: STRING, label2: STRING, type: STRING,
      |    start1: BIGINT, end1: BIGINT, start2: BIGINT, end2: BIGINT,
      |    association: STRING, relation: STRING,
      |    sentEvidenceScore: DOUBLE>>>>""".stripMargin

  val schema: StructType = StructType.fromDDL(ddl)
}
