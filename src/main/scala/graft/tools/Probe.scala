package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      df.printSchema(); df.show(3, false)
      println("maxuser=" + df.agg(org.apache.spark.sql.functions.max("user_id")).head)
    } catch { case e: Throwable => println("READ FAILED: " + e.toString.take(600)) }
    spark.stop()
  }
}
