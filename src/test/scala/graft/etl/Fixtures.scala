package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic fixtures satisfying FIXTURES.md — the reference ships no test
  * data, so these are hand-built to exercise every grounding path:
  * space-bearing field names, the hyphenated `co-occurrence` column, Greek
  * transliteration, pmid repair (null/""/"0", pmcid recovery, anti-join
  * dedup), ambiguous labels (two entities sharing a TT key) and non-ASCII
  * sentences.
  */
/** A labelled synonym cell ({label: …}), as in the targets parquet. */
case class Lbl(label: String)

object Fixtures {

  /** Raw EPMC documents as JSON lines (schema inferred, like production).
    * Note "journal info" — the space in the field name is load-bearing.
    */
  def epmc(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val docs = Seq(
      // doc 1: complete ids, title + results sections
      """{"pmid":"1","pmcid":"PMC1","pubDate":"2020-01-02","organisms":["human"],
        |"journal info":{"name":"J1"},
        |"sentences":[
        | {"section":"Title","text":"SNCA causes asthma",
        |  "matches":[
        |   {"label":"SNCA","type":"GP","startInSentence":0,"endInSentence":4,"sectionStart":0,"sectionEnd":4},
        |   {"label":"asthma","type":"DS","startInSentence":12,"endInSentence":18,"sectionStart":12,"sectionEnd":18}],
        |  "co-occurrence":[
        |   {"label1":"SNCA","label2":"asthma","type":"GP-DS","start1":0,"end1":4,"start2":12,"end2":18,
        |    "association":"yes","relation":"causes","sentEvidenceScore":5.0}]},
        | {"section":"Results","text":"SNCA and SNCA again",
        |  "matches":[
        |   {"label":"SNCA","type":"GP","startInSentence":0,"endInSentence":4,"sectionStart":0,"sectionEnd":4},
        |   {"label":"SNCA","type":"GP","startInSentence":9,"endInSentence":13,"sectionStart":9,"sectionEnd":13}],
        |  "co-occurrence":[]}]}""".stripMargin.replaceAll("\n", ""),
      // doc 2: null pmid, recoverable through PMC2
      """{"pmid":null,"pmcid":"PMC2","pubDate":"2021-06-15","organisms":[],
        |"journal info":{"name":"J2"},
        |"sentences":[
        | {"section":"Abstract","text":"TNF-alpha in breast cancer",
        |  "matches":[
        |   {"label":"TNF-alpha","type":"GP","startInSentence":0,"endInSentence":9,"sectionStart":0,"sectionEnd":9},
        |   {"label":"breast cancer","type":"DS","startInSentence":13,"endInSentence":26,"sectionStart":13,"sectionEnd":26}],
        |  "co-occurrence":[
        |   {"label1":"TNF-alpha","label2":"breast cancer","type":"GP-DS","start1":0,"end1":9,"start2":13,"end2":26,
        |    "association":"yes","relation":"in","sentEvidenceScore":8.0}]}]}""".stripMargin.replaceAll("\n", ""),
      // doc 3: pmid already in the id LUT, no pmcid → dropped by anti-join
      """{"pmid":"3","pmcid":null,"pubDate":"2019-03-03","organisms":[],
        |"journal info":{"name":"J3"},
        |"sentences":[
        | {"section":"Title","text":"dropped doc",
        |  "matches":[{"label":"asthma","type":"DS","startInSentence":0,"endInSentence":6,"sectionStart":0,"sectionEnd":6}],
        |  "co-occurrence":[]}]}""".stripMargin.replaceAll("\n", ""),
      // doc 4: pmcid "0" → null, kept; non-ASCII sentence (α) flags failed_sentence
      """{"pmid":"4","pmcid":"0","pubDate":"2022-12-31","organisms":["mouse"],
        |"journal info":{"name":"J4"},
        |"sentences":[
        | {"section":"Abstract","text":"α-synuclein aggregation",
        |  "matches":[{"label":"α-synuclein","type":"GP","startInSentence":0,"endInSentence":11,"sectionStart":0,"sectionEnd":11}],
        |  "co-occurrence":[]}]}""".stripMargin.replaceAll("\n", ""),
      // doc 5: ambiguous label p38 (two targets share the TT key) + an OG
      // (organism) match — a type outside GP/DS/CD that can never ground
      """{"pmid":"5","pmcid":"PMC5","pubDate":"2023-05-05","organisms":[],
        |"journal info":{"name":"J5"},
        |"sentences":[
        | {"section":"Title","text":"p38 signalling in mouse",
        |  "matches":[
        |   {"label":"p38","type":"GP","startInSentence":0,"endInSentence":3,"sectionStart":0,"sectionEnd":3},
        |   {"label":"mouse","type":"OG","startInSentence":18,"endInSentence":23,"sectionStart":18,"sectionEnd":23}],
        |  "co-occurrence":[]}]}""".stripMargin.replaceAll("\n", ""),
      // doc 6: no ids at all → filtered out
      """{"pmid":"","pmcid":"","pubDate":"","organisms":[],
        |"journal info":{"name":"J6"},
        |"sentences":[
        | {"section":"Title","text":"orphan",
        |  "matches":[{"label":"asthma","type":"DS","startInSentence":0,"endInSentence":6,"sectionStart":0,"sectionEnd":6}],
        |  "co-occurrence":[]}]}""".stripMargin.replaceAll("\n", ""))
    spark.read.json(docs.toDS())
  }

  /** PMID↔PMCID lookup: PMC2→2 (recovery), 3→PMC3 (dupe-drop), plus noise
    * rows that loadEpmcIds must filter.
    */
  def epmcIds(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("2", "PMC2", "10.1/a"),
      ("3", "PMC3", "10.1/b"),
      ("9", null, "10.1/c"),       // null pmcid → dropped
      ("10", "X999", "10.1/d"),    // not a PMC id → dropped
      ("2", "PMC2", "10.1/a"))     // duplicate → distinct
      .toDF("PMID", "PMCID", "DOI")
  }

  def diseases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("EFO_0000270", "asthma",
        Some(Seq("bronchial asthma")), Option.empty[Seq[String]],
        Option.empty[Seq[String]], Option.empty[Seq[String]]),
      ("EFO_0000305", "breast carcinoma",
        Some(Seq("carcinoma of breast")), None, None, Some(Seq("breast cancer"))))
      .toDF("id", "name", "hasExactSynonym", "hasNarrowSynonym", "hasBroadSynonym",
        "hasRelatedSynonym")
      .selectExpr("id", "name",
        """named_struct(
          | 'hasExactSynonym', hasExactSynonym,
          | 'hasNarrowSynonym', hasNarrowSynonym,
          | 'hasBroadSynonym', hasBroadSynonym,
          | 'hasRelatedSynonym', hasRelatedSynonym) as synonyms""".stripMargin)
  }

  def targets(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("ENSG0001", "alpha synuclein", "SNCA",
        Seq.empty[Lbl], Seq(Lbl("α synuclein")), Seq.empty[Lbl], Seq.empty[Lbl],
        Seq(Map("id" -> "P37840"))),
      ("ENSG0002", "tumor necrosis factor", "TNF",
        Seq(Lbl("TNF-alpha")), Seq.empty[Lbl], Seq.empty[Lbl], Seq.empty[Lbl],
        Seq.empty[Map[String, String]]),
      ("ENSG0003", "mitogen-activated protein kinase 14", "MAPK14",
        Seq(Lbl("p38")), Seq.empty[Lbl], Seq.empty[Lbl], Seq.empty[Lbl],
        Seq.empty[Map[String, String]]),
      ("ENSG0004", "mitogen-activated protein kinase 11", "MAPK11",
        Seq(Lbl("p38")), Seq.empty[Lbl], Seq.empty[Lbl], Seq.empty[Lbl],
        Seq.empty[Map[String, String]]))
      .toDF("id", "approvedName", "approvedSymbol", "symbolSynonyms",
        "nameSynonyms", "obsoleteSymbols", "obsoleteNames", "proteinIdsRaw")
      .selectExpr("id", "approvedName", "approvedSymbol", "symbolSynonyms",
        "nameSynonyms", "obsoleteSymbols", "obsoleteNames",
        "transform(proteinIdsRaw, m -> named_struct('id', m['id'])) as proteinIds")
  }

  def drugs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("CHEMBL25", "aspirin", Seq("Ecotrin"), Seq("acetylsalicylic acid")))
      .toDF("id", "name", "tradeNames", "synonyms")
  }

  def grounding(spark: SparkSession): Map[String, DataFrame] =
    Grounding.compute(
      epmc(spark), epmcIds(spark), targets(spark), diseases(spark), drugs(spark))
}
