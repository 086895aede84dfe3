package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class EvolvedReadSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("evolved").toString

  test("added columns merge; files predating them read as NULL") {
    val d1 = tmp(); val d2 = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      .write.mode("overwrite").parquet(d1)
    Seq((3L, "c", "en"), (4L, "d", "fr")).toDF("id", "text", "lang")
      .write.mode("overwrite").parquet(d2)
    val out = EvolvedRead.readMerged(spark, Seq(d1, d2))
    assert(out.columns.sorted.toSeq === Seq("id", "lang", "text"))
    val byId = out.select($"id", $"lang").as[(Long, Option[String])]
      .collect().toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty) // pre-drift files: NULL
    assert(byId(3L) === Some("en") && byId(4L) === Some("fr"))
  }

  test("incompatible type drift fails the merge loudly, never coerces") {
    val d1 = tmp(); val d2 = tmp()
    Seq((1L, 10)).toDF("id", "v").write.mode("overwrite").parquet(d1)
    Seq((2L, "ten")).toDF("id", "v").write.mode("overwrite").parquet(d2)
    val e = intercept[Exception] {
      EvolvedRead.readMerged(spark, Seq(d1, d2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("merg") ||
      e.getMessage.toLowerCase.contains("schema"), e.getMessage)
  }

  test("readAs matches file columns case-insensitively (Spark's default)") {
    val d = tmp()
    Seq((1L, "en")).toDF("id", "Lang").write.mode("overwrite").parquet(d)
    val target = StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType)))
    val out = EvolvedRead.readAs(spark, Seq(d), target)
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("en")) // not silently NULL-ed
  }

  test("empty path lists are rejected with a contract error") {
    intercept[IllegalArgumentException] {
      EvolvedRead.readAs(spark, Nil,
        StructType(Seq(StructField("id", LongType))))
    }
    intercept[IllegalArgumentException] {
      EvolvedRead.readMerged(spark, Nil)
    }
  }

  test("readAs projects each epoch onto the declared schema with widening") {
    val d1 = tmp(); val d2 = tmp()
    // epoch 1: v is INT, no score column; epoch 2: v is LONG + score
    Seq((1L, 10)).toDF("id", "v").write.mode("overwrite").parquet(d1)
    Seq((2L, 20L, 0.5)).toDF("id", "v", "score")
      .write.mode("overwrite").parquet(d2)
    val target = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("score", DoubleType)))
    val out = EvolvedRead.readAs(spark, Seq(d1, d2), target)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(1L -> ((10L, None)), 2L -> ((20L, Some(0.5)))))
    // and the declared schema is exact
    assert(EvolvedRead.readAs(spark, Seq(d1, d2), target).schema === target)
  }
}
