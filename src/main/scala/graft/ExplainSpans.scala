package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, NgramOverlap, TextAnalysis}
object ExplainSpans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val evalSrc = Seq("src0", "src1", "src2")
    val train = docs.where(!col("source").isin(evalSrc: _*))
    val ev = docs.where(col("source").isin(evalSrc: _*))
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(s"$n: ${(System.nanoTime()-t0)/1e6} ms rows=$c")
    }
    // replicate windowTable pieces
    def winTab(df: org.apache.spark.sql.DataFrame) = {
      val txt = col("text")
      val w = Dedup.tokens(txt)
      val winArr = when(size(w) >= 5, Dedup.shinglesFast(txt, 5, distinct = false))
        .otherwise(array().cast("array<string>"))
      df.select(col("doc_id").as("id"), posexplode(winArr).as(Seq("__pos", "__g")))
        .select(col("id"), col("__pos"),
          call_function(graft.expressions.GraftFunctions.RollingFpTriple, col("__g")).as("__fs"))
        .select(col("id"), col("__pos"),
          element_at(col("__fs"), 1).as("__f1"),
          element_at(col("__fs"), 2).as("__f2"),
          element_at(col("__fs"), 3).as("__f3"))
    }
    time("train windows")(winTab(train).count())
    time("eval distinct")(winTab(ev).select("__f1","__f2","__f3").distinct().count())
    val dup = winTab(train).join(broadcast(winTab(ev).select("__f1","__f2","__f3").distinct()),
      Seq("__f1","__f2","__f3"), "left_semi")
    time("semi join")(dup.count())
    time("full spans")(NgramOverlap.contaminatedSpans(train, ev, "doc_id", "text", 5,
      broadcastEval = true).count())
    time("full spans again")(NgramOverlap.contaminatedSpans(train, ev, "doc_id", "text", 5,
      broadcastEval = true).count())
    time("no broadcast")(NgramOverlap.contaminatedSpans(train, ev, "doc_id", "text", 5,
      broadcastEval = false).count())
  }
}
