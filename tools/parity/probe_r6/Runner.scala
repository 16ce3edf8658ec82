import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Runner {
  def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.toString
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.spark.GraftFunctions.registerAll(spark)
    val dir = new java.io.File("/tmp/vprobe/docs")
    val names = dir.listFiles().map(_.getName).sorted
    import spark.implicits._
    val df = names.map { n =>
      val content = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, n).toPath), java.nio.charset.StandardCharsets.UTF_8)
      (n, content)
    }.toSeq.toDF("name", "html")
    df.createOrReplaceTempView("docs")
    val rows = spark.sql(
      "SELECT name, s.text FROM docs LATERAL VIEW explode(parse_html_spans(html)) t AS s " +
      "WHERE s.kind != 'media'")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
    val out = new StringBuilder
    names.foreach { n =>
      out.append(s"### $n\n")
      rows.getOrElse(n, Array.empty).foreach { case (_, t) => out.append(esc(t)).append('\n') }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/vprobe/mine.out"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
