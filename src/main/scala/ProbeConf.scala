object ProbeConf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    for (k <- Seq("spark.sql.streaming.stateStore.providerClass",
      "spark.sql.streaming.stateStore.maintenanceInterval",
      "spark.sql.streaming.stateStore.minDeltasForSnapshot",
      "spark.sql.streaming.checkpoint.fileManagerClass",
      "spark.sql.streaming.stateStore.compression.codec",
      "spark.sql.shuffle.partitions",
      "spark.sql.streaming.statefulOperator.useStrictDistribution"))
      println(k + " = " + scala.util.Try(spark.conf.get(k)).getOrElse("<unset>"))
    spark.stop()
  }
}
