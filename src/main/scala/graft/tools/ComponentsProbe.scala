package graft.tools

import graft.operators.{Components, Similarity}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SqlShim

/** Per-phase timing of q_dup_components (pairs build vs propagation loop,
  * rounds, per-round seconds) — the measurement behind the round-6 rework.
  * Usage: runMain graft.tools.ComponentsProbe [sfDir] [cores]
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (run <- 1 to 2) {
      println(s"[cp] ==== run $run")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val pairs = Similarity.nearDupPairsLsh(emb, threshold = 0.30)
        .localCheckpoint(false)
      t("pairs build+materialize")(pairs.count())
      println(s"[cp] pairs=${pairs.count()}")
      // inline copy of the propagation loop with per-round timing
      val sym = t("sym build") {
        val s = pairs
          .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
          .union(pairs.select(col("id_b").cast("long").as("a"), col("id_a").cast("long").as("b")))
          .distinct()
          .repartition(col("a"))
          .persist()
        s.count()
        s
      }
      def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0))
          .getOrElse(java.math.BigDecimal.ZERO)
      var labels = sym.select(col("a").as("id")).distinct()
        .withColumn("comp", col("id"))
        .localCheckpoint(false)
      var prevSum = t("init labels")(labelSum(labels))
      var iter = 0
      var converged = false
      while (!converged && iter < 64) {
        val prop = sym.join(labels.withColumnRenamed("id", "a"), "a")
          .select(col("b").as("id"), col("comp"))
        val half = labels.select(col("id"), col("comp"), col("comp").as("own"))
          .unionByName(prop.withColumn("own", lit(null).cast("long")))
          .groupBy("id").agg(min("comp").as("h"), min("own").as("comp"))
        val starMin = half.groupBy("comp").agg(min("h").as("sm"))
        val next = t(s"round $iter ckpt-build") {
          half.join(starMin, "comp")
            .select(col("id"), least(col("h"), col("sm")).as("comp"))
            .localCheckpoint(false)
        }
        val nextSum = t(s"round $iter labelSum")(labelSum(next))
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        t(s"round $iter unpersist")(SqlShim.unpersistLocalCheckpoint(labels))
        labels = next
        iter += 1
      }
      println(s"[cp] rounds=$iter converged=$converged")
      sym.unpersist()
      SqlShim.unpersistLocalCheckpoint(labels)
      SqlShim.unpersistLocalCheckpoint(pairs)
    }
    spark.stop()
  }
}
