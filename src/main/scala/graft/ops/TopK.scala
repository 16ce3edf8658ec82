package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k by (score desc, id asc) as a typed Aggregator.
  *
  * Replaces `row_number().over(Window.partitionBy(query))` for ANN
  * ranking: the window plan shuffles EVERY (query, corpus) score to
  * sort it, then discards all but k — at 100 TB × Q queries the rank
  * shuffle dominates the job. The aggregator keeps a size-k buffer per
  * query inside the partial (map-side) aggregate, so only |Q|·k rows
  * ever cross the wire; the final merge is a fold of sorted k-lists.
  *
  * Total order (score desc, id asc) is strict — ids are unique — so the
  * merge result is independent of partial-aggregation order and the
  * output is hash-identical to the window formulation it replaced.
  */
object TopK {

  final case class Scored(vec_id: Long, cosine: Double)
  final case class Buf(items: Seq[Scored])

  final class TopKAgg(k: Int) extends Aggregator[Scored, Buf, Buf] {
    private def better(a: Scored, b: Scored): Boolean =
      a.cosine > b.cosine || (a.cosine == b.cosine && a.vec_id < b.vec_id)

    /** Insert into a best-first sorted buffer, keeping length ≤ k. */
    private def insert(buf: Seq[Scored], s: Scored): Seq[Scored] =
      if (buf.length >= k && !better(s, buf.last)) buf
      else {
        val (pre, post) = buf.span(b => better(b, s))
        ((pre :+ s) ++ post).take(k)
      }

    override def zero: Buf = Buf(Seq.empty)
    override def reduce(b: Buf, a: Scored): Buf = Buf(insert(b.items, a))
    override def merge(x: Buf, y: Buf): Buf = Buf(y.items.foldLeft(x.items)(insert))
    override def finish(r: Buf): Buf = r
    override def bufferEncoder = Encoders.product[Buf]
    override def outputEncoder = Encoders.product[Buf]
  }

  // ------------------------------------------- string-payload variant

  final case class SItem(text: String, cnt: Long)
  final case class SBuf(items: Seq[SItem])

  /** Bounded top-k of STRING values by (cnt desc, text asc) — the
    * anchor-text / top-host / top-n-gram shape. Tie-break is CODEPOINT
    * order ([[TextNorm.cpCompare]], the canonical ordering alphabet),
    * never String.compareTo: DuckDB compares UTF-8 bytes, and astral
    * anchors would otherwise rank differently on the two sides. */
  final class TopKStrAgg(k: Int) extends Aggregator[SItem, SBuf, SBuf] {
    private def better(a: SItem, b: SItem): Boolean =
      a.cnt > b.cnt ||
        (a.cnt == b.cnt && TextNorm.cpCompare(a.text, b.text) < 0)

    private def insert(buf: Seq[SItem], s: SItem): Seq[SItem] =
      if (buf.length >= k && !better(s, buf.last)) buf
      else {
        val (pre, post) = buf.span(b => better(b, s))
        ((pre :+ s) ++ post).take(k)
      }

    override def zero: SBuf = SBuf(Seq.empty)
    override def reduce(b: SBuf, a: SItem): SBuf = SBuf(insert(b.items, a))
    override def merge(x: SBuf, y: SBuf): SBuf =
      SBuf(y.items.foldLeft(x.items)(insert))
    override def finish(r: SBuf): SBuf = r
    override def bufferEncoder = Encoders.product[SBuf]
    override def outputEncoder = Encoders.product[SBuf]
  }

  /** (key, text, cnt) → (key, text, cnt, rank≤k), rank 1-based by
    * (cnt desc, text codepoint-asc). One map-side-combined aggregate
    * with a size-k buffer per key — only |keys|·k rows cross the wire,
    * never a corpus row_number Window. Null texts are dropped (rank of
    * an absent value is undefined); cap text length upstream if keys
    * can carry pathological multi-MB values. */
  def perKeyTopStrings(counted: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new TopKStrAgg(k), Encoders.product[SItem])
    counted.filter(col("text").isNotNull)
      .groupBy("key")
      .agg(agg(col("text"), col("cnt").cast("long")).as("top"))
      .select(col("key"), posexplode(col("top.items")).as(Seq("pos", "s")))
      .select(col("key"), col("s.text").as("text"), col("s.cnt").as("cnt"),
        (col("pos") + 1).as("rank"))
  }

  /** (query_id, vec_id, cosine) → (query_id, vec_id, cosine, rank≤k),
    * rank 1-based by (cosine desc, vec_id asc). One map-side-combined
    * aggregate; no full-score shuffle.
    *
    * The aggregation buffer carries vec_id as a long, so the id column
    * must be integral — a string/decimal id would otherwise cast to
    * NULL silently and corrupt the ranking (round-2 ADVICE: fail loud). */
  def perQueryTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = scored.schema("vec_id").dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"perQueryTopK needs an integral vec_id (byte/short/int/long); got $idType — " +
        "map your ids to longs (e.g. xxhash64 or a dictionary join) before ranking")
    val agg = udaf(new TopKAgg(k), Encoders.product[Scored])
    scored.groupBy("query_id")
      .agg(agg(col("vec_id").cast("long"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top.items")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.vec_id").as("vec_id"),
        col("s.cosine").as("cosine"), (col("pos") + 1).as("rank"))
  }
}
