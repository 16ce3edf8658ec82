package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{GraftFunctions, CorpusGen, DocRow, Pipeline}
import graft.ops.{Dedup, Similarity, TextOps, Multimodal}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The HTML-engine queries construct deterministic HTML from the
  * `documents` columns inside the query, run the full native pipeline
  * (tokenizer → tree builder → extractor / serializer), and are checked
  * against DuckDB oracles that compute the expected result with pure
  * string SQL — i.e. the parser itself is oracle-verified end-to-end.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerAll(s)
    TextOps.registerAll(s)
    s.read.parquet(s"$dir/documents.parquet")
  }

  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_html_extract")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----------------------------------------------- HTML engine queries
    "q_html_extract" -> ((s, dir) => {
      val d = docs(s, dir)
      val html = concat(lit("<html><head><title>"), col("source"),
        lit("</title></head><body><h1>"), col("lang"),
        lit("</h1><p>"), col("text"), lit("</p></body></html>"))
      d.select(col("doc_id"),
          explode(GraftFunctions.parse_html_spans(html)).as("s"))
        .select(col("doc_id"), col("s.kind").as("kind"),
          col("s.text").as("span_text"), col("s.offset").as("offset"))
    }),

    "q_html_entities" -> ((s, dir) => {
      val d = docs(s, dir)
      val html = concat(lit("<p>"),
        regexp_replace(col("text"), lit(" "), lit("&#32;")), lit("</p>"))
      d.select(col("doc_id"),
        GraftFunctions.parse_html_text(html).as("decoded"),
        GraftFunctions.parse_html_text(
          lit("<p>A &amp;&lt; B &copy; &#x41;</p>")).as("decoded2"))
    }),

    "q_html_misnest" -> ((s, dir) => {
      val d = docs(s, dir).filter(length(col("text")) >= 40)
      val html = concat(lit("<p>"), substring(col("text"), 1, 8),
        lit("<b>"), substring(col("text"), 9, 8),
        lit("<i>"), substring(col("text"), 17, 8),
        lit("</b>"), substring(col("text"), 25, 8),
        lit("</i>"), substring(col("text"), 33, 8), lit("</p>"))
      d.select(col("doc_id"), GraftFunctions.parse_html_text(html).as("extracted"))
    }),

    "q_html_foster" -> ((s, dir) => {
      val d = docs(s, dir).filter(length(col("text")) >= 12)
      val html = concat(lit("<table>"), substring(col("text"), 1, 12),
        lit("<tr><td>CELL</td></tr></table>"))
      val spans = GraftFunctions.parse_html_spans(html)
      d.select(col("doc_id"),
        element_at(spans, 1).getField("text").as("leak"),
        element_at(spans, 2).getField("text").as("cell"))
    }),

    "q_html_script_skip" -> ((s, dir) => {
      val d = docs(s, dir)
      val html = concat(lit("<p>keep1</p><script>"), col("text"),
        lit("</script><style>h1{color:red}</style><p>keep2</p><!-- "),
        col("source"), lit(" --><textarea>"), col("lang"), lit("</textarea>"))
      d.select(col("doc_id"), GraftFunctions.parse_html_text(html).as("extracted"))
    }),

    "q_html_media" -> ((s, dir) => {
      val d = docs(s, dir).filter(length(col("text")) >= 6)
      val html = concat(lit("<p>"), substring(col("text"), 1, 6),
        lit("<img src=\"m://"), col("doc_id").cast("string"),
        lit("/a.png\"><video src=\"m://"), col("doc_id").cast("string"),
        lit("/b.mp4\"></video></p>"))
      d.select(col("doc_id"),
          posexplode(GraftFunctions.parse_html_spans(html)).as(Seq("pos", "s")))
        .select(col("doc_id"), col("pos"), col("s.kind").as("kind"),
          col("s.media_ref").as("media_ref"))
    }),

    "q_html_rcdata" -> ((s, dir) => {
      val d = docs(s, dir)
      val html = concat(lit("<title>"), col("source"), lit("<b>x</title>"))
      d.select(col("doc_id"), GraftFunctions.parse_html_text(html).as("extracted"))
    }),

    "q_html_pre" -> ((s, dir) => {
      val d = docs(s, dir).filter(length(col("text")) >= 10)
      val html = concat(lit("<pre>\n"), substring(col("text"), 1, 10), lit("</pre>"))
      val spans = GraftFunctions.parse_html_spans(html)
      d.select(col("doc_id"),
        element_at(spans, 1).getField("kind").as("kind1"),
        element_at(spans, 1).getField("text").as("text1"))
    }),

    "q_html_attrs" -> ((s, dir) => {
      val d = docs(s, dir)
      val html = concat(lit("<div id=\""), col("source"),
        lit("\" CLASS=c1 class=c2 data-n="), col("doc_id").cast("string"),
        lit(">t</div>"))
      d.select(col("doc_id"),
        call_udf("html_attr_match_count", html, lit("class"), lit("c1"), lit("eq")).as("c1"),
        call_udf("html_attr_match_count", html, lit("class"), lit("c2"), lit("eq")).as("c2"),
        call_udf("html_attr_match_count", html, lit("id"), lit("src"), lit("begin")).as("idm"))
    }),

    "q_html_serialize" -> ((s, dir) => {
      val d = docs(s, dir).filter(length(col("text")) >= 20)
      val html = concat(lit("<p>"), substring(col("text"), 1, 20), lit("</p>"))
      d.select(col("doc_id"), GraftFunctions.serialize_html(html).as("normalized"))
    }),

    "q_html_quirks" -> ((s, dir) => {
      val d = docs(s, dir)
      val html = when(pmod(col("doc_id"), lit(3)) === 0,
          lit("<!DOCTYPE html><p>x</p>"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("<p>x</p>"))
        .otherwise(lit(
          "<!DOCTYPE html PUBLIC \"-//W3C//DTD HTML 4.01 Transitional//EN\"><p>x</p>"))
      d.select(col("doc_id"), GraftFunctions.html_quirks_mode(html).as("quirks"))
    }),

    "q_html_tokens" -> ((s, dir) => {
      val d = docs(s, dir).filter(length(col("text")) >= 10)
      val html = concat(lit("<p id=\"1\">"), substring(col("text"), 1, 10),
        lit("</p><!--c-->"))
      d.select(col("doc_id"),
          posexplode(GraftFunctions.tokenize_html(html)).as(Seq("pos", "t")))
        .select(col("doc_id"), col("pos"), col("t.ttype").as("ttype"),
          col("t.name").as("name"), col("t.data").as("data"),
          col("t.offset").as("offset"))
    }),

    "q_html_nodes" -> ((s, dir) => {
      val d = docs(s, dir).filter(length(col("text")) >= 5)
      val html = concat(lit("<div id=\"x\"><p>"), substring(col("text"), 1, 5),
        lit("</p><br></div>"))
      d.select(col("doc_id"),
          posexplode(GraftFunctions.parse_html_nodes(html)).as(Seq("pos", "n")))
        .select(col("doc_id"), col("pos"), col("n.tag").as("tag"),
          col("n.depth").as("depth"), col("n.ntype").as("ntype"),
          col("n.text").as("ntext"), col("n.nattrs").as("nattrs"))
    }),

    "q_charset_sniff" -> ((s, dir) => {
      val d = docs(s, dir)
      val bytes = when(pmod(col("doc_id"), lit(2)) === 0,
          lit("<meta charset=\"windows-1251\"><p>x</p>"))
        .otherwise(lit("plain ascii text only")).cast("binary")
      d.select(col("doc_id"), GraftFunctions.prescan_charset(bytes).as("charset"))
    }),

    // ------------------------------------------- training-data pipeline
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactKeepList(docs(s, dir), "doc_id", "source")),

    "q_text_stats" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.uniqueTokenCount(col("text")).as("n_uniq"),
        TextOps.alphaChars(col("text")).as("n_alpha"),
        TextOps.charCount(col("text")).as("n_chars2"))),

    "q_embed_norm" -> ((s, dir) =>
      embs(s, dir).select(col("vec_id"),
        round(Similarity.l2Norm(col("embedding")), 2).as("norm2"))),

    "q_ann_self" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "qid", "qvec", k = 1)
        .select(col("query_id"), col("vec_id").as("top_vec_id"))
    }),

    // --------------------------------- rows-only ops (no SQL equivalent)
    "q_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        expr("graft_lang_id(text)").as("lang_pred"))),

    "q_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.subwordCount(col("text")).as("n_subwords"))),

    "q_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        expr("graft_fingerprint64(text)").as("fp"),
        expr("graft_simhash64(text)").as("simhash"))),

    "q_minhash_dedup" -> ((s, dir) =>
      Dedup.minhashCandidates(docs(s, dir), "doc_id", "text",
        k = 32, bands = 8, jaccardThreshold = 0.5)),

    "q_simhash_dedup" -> ((s, dir) =>
      Dedup.simhashCandidates(docs(s, dir), "doc_id", "text", maxHamming = 6)),

    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", threshold = 0.3)),

    "q_ann_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "qid", "qvec", k = 5)
        .select(col("query_id"), col("vec_id"), round(col("cosine"), 4).as("cosine"),
          col("rank"))
    }),

    "q_ann_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.lshTopK(e, "vec_id", "embedding", q, "qid", "qvec", k = 5, planes = 6)
        .select(col("query_id"), col("vec_id"), col("rank"))
    }),

    "q_embed_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDup(embs(s, dir), "vec_id", "embedding",
        planes = 8, threshold = 0.8)),

    "q_multimodal_stub" -> ((s, dir) => {
      import s.implicits._
      val media = docs(s, dir).select(
          col("doc_id").cast("string").as("media_id"),
          when(pmod(col("doc_id"), lit(3)) === 0, "image")
            .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
            .otherwise("video").as("media_type"),
          col("text").cast("binary").as("payload"),
          lit(64).as("width"), lit(64).as("height"),
          (col("n_chars") * 100).as("duration_ms"))
        .as[Multimodal.MediaRow]
      Multimodal.extractFeatures(media, dim = 16)
        .select(col("media_id"), col("media_type"),
          col("frames_sampled"), col("ok"))
    }),

    "q_pipeline_e2e" -> ((s, dir) => {
      // self-contained flagship: seeded corpus → full pipeline → compare
      // with constructive expected (BASELINE.json correctness invariant)
      import s.implicits._
      val n = 300
      val input = CorpusGen.inputDs(s, n, parallelism = 8).toDF()
      val (out, _) = Pipeline.extract(s, input,
        Pipeline.Config(partitions = 8, giantBuckets = 2))
      val expected = CorpusGen.expectedDf(s, n, parallelism = 8).as[DocRow]
      val got = out.withColumnRenamed("spans", "got_spans")
      val cmp = got.join(expected.toDF(), "doc_id")
        .select(col("doc_id"),
          (col("got_spans") === col("spans")).as("matched"),
          col("doc_id").startsWith("garbage-").as("garbage"))
      cmp.agg(
        count(lit(1)).as("docs"),
        sum(when(col("matched") || col("garbage"), 1L).otherwise(0L)).as("ok_docs"))
    })
  )

  /** DuckDB-equivalent SQL per oracle-checkable query (same column
    * names, same values — the driver hash-compares). */
  def oracleSql: Map[String, String] = Map(

    "q_html_extract" ->
      """SELECT doc_id, 'text' AS kind, source AS span_text, 19 AS offset FROM documents
        |UNION ALL
        |SELECT doc_id, 'heading' AS kind, lang AS span_text,
        |       CAST(44 + length(source) AS INT) AS offset FROM documents
        |UNION ALL
        |SELECT doc_id, 'text' AS kind, text AS span_text,
        |       CAST(52 + length(source) + length(lang) AS INT) AS offset FROM documents"""
        .stripMargin,

    "q_html_entities" ->
      "SELECT doc_id, text AS decoded, 'A &< B © A' AS decoded2 FROM documents",

    "q_html_misnest" ->
      """SELECT doc_id,
        |  substr(text,1,8) || ' ' || substr(text,9,8) || ' ' || substr(text,17,8)
        |  || ' ' || substr(text,25,8) || ' ' || substr(text,33,8) AS extracted
        |FROM documents WHERE length(text) >= 40""".stripMargin,

    "q_html_foster" ->
      """SELECT doc_id, substr(text,1,12) AS leak, 'CELL' AS cell
        |FROM documents WHERE length(text) >= 12""".stripMargin,

    "q_html_script_skip" ->
      "SELECT doc_id, 'keep1 keep2' AS extracted FROM documents",

    "q_html_media" ->
      """SELECT doc_id, 0 AS pos, 'text' AS kind, '' AS media_ref
        |FROM documents WHERE length(text) >= 6
        |UNION ALL
        |SELECT doc_id, 1 AS pos, 'media' AS kind,
        |       'm://' || CAST(doc_id AS VARCHAR) || '/a.png' AS media_ref
        |FROM documents WHERE length(text) >= 6
        |UNION ALL
        |SELECT doc_id, 2 AS pos, 'media' AS kind,
        |       'm://' || CAST(doc_id AS VARCHAR) || '/b.mp4' AS media_ref
        |FROM documents WHERE length(text) >= 6""".stripMargin,

    "q_html_rcdata" ->
      "SELECT doc_id, source || '<b>x' AS extracted FROM documents",

    "q_html_pre" ->
      """SELECT doc_id, 'pre' AS kind1, substr(text,1,10) AS text1
        |FROM documents WHERE length(text) >= 10""".stripMargin,

    "q_html_attrs" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS c1, CAST(0 AS BIGINT) AS c2,
        |       CAST(1 AS BIGINT) AS idm FROM documents""".stripMargin,

    "q_html_serialize" ->
      """SELECT doc_id, '<html><head></head><body><p>' || substr(text,1,20)
        |       || '</p></body></html>' AS normalized
        |FROM documents WHERE length(text) >= 20""".stripMargin,

    "q_html_quirks" ->
      """SELECT doc_id, CASE CAST(doc_id % 3 AS INT)
        |  WHEN 0 THEN 'no-quirks' WHEN 1 THEN 'quirks' ELSE 'quirks' END AS quirks
        |FROM documents""".stripMargin,

    "q_html_nodes" ->
      """SELECT doc_id, 0 AS pos, 'html' AS tag, 0 AS depth, 'element' AS ntype, '' AS ntext, 0 AS nattrs FROM documents WHERE length(text) >= 5
        |UNION ALL SELECT doc_id, 1, 'head', 1, 'element', '', 0 FROM documents WHERE length(text) >= 5
        |UNION ALL SELECT doc_id, 2, 'body', 1, 'element', '', 0 FROM documents WHERE length(text) >= 5
        |UNION ALL SELECT doc_id, 3, 'div', 2, 'element', '', 1 FROM documents WHERE length(text) >= 5
        |UNION ALL SELECT doc_id, 4, 'p', 3, 'element', '', 0 FROM documents WHERE length(text) >= 5
        |UNION ALL SELECT doc_id, 5, '#text', 4, 'text', substr(text,1,5), 0 FROM documents WHERE length(text) >= 5
        |UNION ALL SELECT doc_id, 6, 'br', 3, 'element', '', 0 FROM documents WHERE length(text) >= 5""".stripMargin,

    "q_html_tokens" ->
      """SELECT doc_id, 0 AS pos, 'StartTag' AS ttype, 'p' AS name, '' AS data, 0 AS offset
        |FROM documents WHERE length(text) >= 10
        |UNION ALL
        |SELECT doc_id, 1, 'Characters', '', substr(text,1,10), 10
        |FROM documents WHERE length(text) >= 10
        |UNION ALL
        |SELECT doc_id, 2, 'EndTag', 'p', '', 20
        |FROM documents WHERE length(text) >= 10
        |UNION ALL
        |SELECT doc_id, 3, 'Comment', '', 'c', 24
        |FROM documents WHERE length(text) >= 10""".stripMargin,

    "q_charset_sniff" ->
      """SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'windows-1251'
        |  ELSE 'UTF-8' END AS charset FROM documents""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(lower(trim(source))) AS text_hash, min(doc_id) AS doc_id,
        |       CAST(count(*) AS BIGINT) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_uniq,
        |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
        |  CAST(length(text) AS BIGINT) AS n_chars2
        |FROM documents""".stripMargin,

    "q_embed_norm" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 2) AS norm2
        |FROM embeddings""".stripMargin,

    "q_ann_self" ->
      "SELECT vec_id AS query_id, vec_id AS top_vec_id FROM embeddings WHERE vec_id < 20"
  )
}
