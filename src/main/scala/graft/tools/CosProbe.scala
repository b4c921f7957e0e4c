package graft.tools

import org.apache.spark.sql.functions._

/** Isolates the per-pair cost of the fused-cosine vs precomputed-norm UDF
  * shapes on the real label-blocked join (r6 regression hunt).
  * Usage: runMain graft.tools.CosProbe [sfDir] [reps]
  */
object CosProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    val cosOld = udf { (a: Seq[java.lang.Float], b: Seq[java.lang.Float]) =>
      if (a == null || b == null || a.length != b.length) None
      else {
        var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
        while (i < a.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          d += x * y; na += x * x; nb += y * y; i += 1
        }
        Some(d / (math.sqrt(na) * math.sqrt(nb)))
      }
    }
    val nrmU = udf { (a: Seq[java.lang.Float]) =>
      if (a == null) None
      else {
        var i = 0; var na = 0.0
        while (i < a.length) { val x = a(i).toDouble; na += x * x; i += 1 }
        Some(math.sqrt(na))
      }
    }
    val cosPre = udf {
      (a: Seq[java.lang.Float], b: Seq[java.lang.Float],
       na: java.lang.Double, nb: java.lang.Double) =>
        if (a == null || b == null || na == null || nb == null) None
        else {
          var i = 0; var d = 0.0
          while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
          Some(d / (na * nb))
        }
    }

    def t(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cos] $label: min=${times.min}%.2f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }

    // old: fused cosine per pair
    t("fused  ") {
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("label"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("label"))
      a.join(b, "label").filter(col("id_a") < col("id_b"))
        .withColumn("cos", cosOld(col("emb_a"), col("emb_b")))
        .filter(col("cos") >= 0.30)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    }
    // new: precomputed norms
    t("prenorm") {
      val embN = emb.select(col("vec_id"), col("embedding"), col("label"),
        nrmU(col("embedding")).as("nrm"))
      val a = embN.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a"), col("label"))
      val b = embN.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b"), col("label"))
      a.join(b, "label").filter(col("id_a") < col("id_b"))
        .withColumn("cos", cosPre(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")))
        .filter(col("cos") >= 0.30)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    }
    def tc(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cos] $label: min=${times.min}%.2f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    tc("fused   count") {
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("label"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("label"))
      a.join(b, "label").filter(col("id_a") < col("id_b"))
        .withColumn("cos", cosOld(col("emb_a"), col("emb_b")))
        .filter(col("cos") >= 0.30)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    }
    tc("prenorm count") {
      val embN = emb.select(col("vec_id"), col("embedding"), col("label"),
        nrmU(col("embedding")).as("nrm"))
      val a = embN.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a"), col("label"))
      val b = embN.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b"), col("label"))
      a.join(b, "label").filter(col("id_a") < col("id_b"))
        .withColumn("cos", cosPre(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")))
        .filter(col("cos") >= 0.30)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    }
    val dotU = udf { (a: Seq[java.lang.Float], b: Seq[java.lang.Float]) =>
      if (a == null || b == null || a.length != b.length) None
      else {
        var i = 0; var d = 0.0
        while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
        Some(d)
      }
    }
    tc("dotdiv  count") {
      val embN = emb.select(col("vec_id"), col("embedding"), col("label"),
        nrmU(col("embedding")).as("nrm"))
      val a = embN.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a"), col("label"))
      val b = embN.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b"), col("label"))
      a.join(b, "label").filter(col("id_a") < col("id_b"))
        .withColumn("cos", dotU(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
        .filter(col("cos") >= 0.30)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    }
    val cosFast = udf {
      (a: Array[Float], b: Array[Float], na: java.lang.Double, nb: java.lang.Double) =>
        if (a == null || b == null || na == null || nb == null || a.length != b.length) None
        else {
          var i = 0; var d = 0.0
          while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
          Some(d / (na * nb))
        }
    }
    tc("fast    count") {
      val embN = emb.select(col("vec_id"), col("embedding"), col("label"),
        nrmU(col("embedding")).as("nrm"))
        .withColumn("embedding", when(col("nrm").isNotNull, col("embedding")))
      val a = embN.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a"), col("label"))
      val b = embN.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b"), col("label"))
      a.join(b, "label").filter(col("id_a") < col("id_b"))
        .withColumn("cos", cosFast(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")))
        .filter(col("cos") >= 0.30)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    }
    // count pairs for context
    val a = emb.select(col("vec_id").as("id_a"), col("label"))
    val b = emb.select(col("vec_id").as("id_b"), col("label"))
    println("[cos] pairs=" + a.join(b, "label").filter(col("id_a") < col("id_b")).count())
    spark.stop()
  }
}
