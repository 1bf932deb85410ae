package graft

import org.apache.spark.sql.functions._

/** TEMP probe for the sf1 TPC-H floor — deleted before commit. */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = GraftSession.local("scratch-perf")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.enableCache()
    val li = Tables.table(spark, sfDir, "lineitem")
    li.count()
    def money(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def t(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$name%-22s run$i ${(System.nanoTime()-t0)/1e9}%7.3f s")
      }
    }
    t("count")(li.count())
    t("sum_double") {
      li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("a"), sum(col("l_extendedprice")).as("b"),
          count(lit(1)).as("n")).collect()
    }
    t("q1_decimal") {
      li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order")).collect()
    }
    t("join_q18_shape") {
      val bigKeys = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
        .filter(col("s") > lit(300).cast("decimal(18,2)"))
      Tables.table(spark, sfDir, "orders")
        .join(bigKeys, col("o_orderkey") === col("l_orderkey")).count()
    }
    t("groupby_orderkey_long") {
      li.groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("s"))
        .filter(col("s") > 300.0).count()
    }
    spark.stop()
  }
}
