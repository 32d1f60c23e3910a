package graft.tools
import org.apache.spark.sql.functions._
object SplitCountProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    val raw = graft.sources.Tables.documents(spark, "target/testdata/sf10")
      .select(col("doc_id"), col("text"))
    println("[split] docs partitions=" + raw.rdd.getNumPartitions +
      " defaultPar=" + spark.sparkContext.defaultParallelism)
    spark.stop()
  }
}
