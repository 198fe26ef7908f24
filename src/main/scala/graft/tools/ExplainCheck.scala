package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints the formatted physical plan of selected
  * queries so pushdown / broadcast / codegen properties can be inspected
  * (`sbt "runMain graft.tools.ExplainCheck q02_select_filter ..."`).
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSessions.local("8", "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
