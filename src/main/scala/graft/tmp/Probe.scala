package graft.tmp
import org.apache.spark.sql.functions._
import graft.ops._
object Probe {
  def time(tag: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.schema.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    val toks = TextOps.tokens(col("text"))
    // warm
    noop(docs.select(col("doc_id")))
    time("tokens only")            { noop(docs.select(col("doc_id"), toks.as("w"))) }
    time("sort(tokens)")           { noop(docs.select(col("doc_id"), array_sort(toks).as("w"))) }
    time("topCount(tokens) x1")    { noop(docs.select(col("doc_id"), TextOps.topCount(toks).as("c"))) }
    time("topCount(bigrams) x1")   { noop(docs.select(col("doc_id"), TextOps.topCount(TextOps.shingles(toks,2)).as("c"))) }
    time("full repetitionCols")    { noop(docs.select(col("doc_id") +: TextOps.repetitionCols(toks): _*)) }
    time("full repetitionCols(2)") { noop(docs.select(col("doc_id") +: TextOps.repetitionCols(toks): _*)) }
    spark.stop()
  }
}
