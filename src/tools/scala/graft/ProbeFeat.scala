package graft
import org.apache.spark.sql.SparkSession

/** Scratch: does this Spark build support WITH RECURSIVE and VARIANT? */
object ProbeFeat {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val r = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5)
          |SELECT SUM(n) AS s FROM t""".stripMargin).collect()
      println("RECURSIVE OK: " + r.mkString)
    } catch { case e: Throwable => println("RECURSIVE FAIL: " + e.getMessage.take(200)) }
    try {
      val r = spark.sql(
        """SELECT variant_get(parse_json('{"a": {"b": 42}}'), '$.a.b', 'int') AS v""").collect()
      println("VARIANT OK: " + r.mkString)
    } catch { case e: Throwable => println("VARIANT FAIL: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
