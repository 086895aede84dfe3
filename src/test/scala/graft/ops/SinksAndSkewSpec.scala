package graft.ops

import graft.SparkSpec
import graft.sources.ParquetSink
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksAndSkewSpec extends SparkSpec {
  import spark.implicits._

  test("overwritePartitions replaces only the partitions present") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val v1 = Seq((2012, "16", 1L), (2012, "30", 2L), (2013, "16", 3L))
      .toDF("year", "state", "v")
    ParquetSink.overwritePartitions(v1, dir, Seq("year", "state"))
    // re-pull of (2012,16) only, with a corrected value
    val v2 = Seq((2012, "16", 99L)).toDF("year", "state", "v")
    ParquetSink.overwritePartitions(v2, dir, Seq("year", "state"))
    val out = spark.read.parquet(dir)
      .select($"year", $"state", $"v").as[(Int, String, Long)]
      .collect().toSet
    assert(out === Set((2012, "16", 99L), (2012, "30", 2L), (2013, "16", 3L)))
  }

  test("salted join equals the plain join on skewed data") {
    val big = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", 1.0), ("k7", 2.0), ("missing", 3.0)).toDF("key", "w")
    val plain = big.join(small, Seq("key")).select($"key", $"v", $"w")
    val salted = SkewJoin.saltedJoin(big, small, Seq("key"), saltBy = $"v")
      .select($"key", $"v", $"w")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === 1001) // 1000 hot + k7
  }
}
