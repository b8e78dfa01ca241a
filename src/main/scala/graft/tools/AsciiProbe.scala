package graft.tools
import org.apache.spark.sql.SparkSession
object AsciiProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[1]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.sql("SELECT ascii('é') AS a, ascii('日') AS b, " +
      "split('é日', '') AS pieces").show(false)
  }
}
