package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev utility: regenerate the sketch-family golden snapshot consumed by
  * [[graft.SketchGolden]] / q130. Unlike the pure-JVM Gen tools, this one
  * must run Spark — the approximate columns characterize the engine's own
  * sketch implementations (the exact columns and rank windows are
  * independently re-derived in `SketchGolden.recomputeExact` and
  * cross-checked by `SketchGoldenSpec`).
  * Usage: runMain graft.tools.GenSketchGolden [out.tsv] */
object GenSketchGolden {
  def main(args: Array[String]): Unit = {
    val out =
      if (args.nonEmpty) args(0)
      else "src/main/resources/sketch_golden_snapshot.tsv"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.Queries.sketchGolden(spark, "").collect().map { r =>
      Seq(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)).mkString("\t")
    }
    Files.write(Paths.get(out), rows.mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${rows.length} rows to $out")
    spark.stop()
  }
}
