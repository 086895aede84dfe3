package graft.sim

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AnnIndexSpec extends SparkSpec {

  private val params = AnnIndex.Params(dims = 64, coarseK = 8,
    coarseIters = 2, m = 4, k = 4, pqIters = 1, nprobeDefault = 3)

  private def freshPath(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"ann_idx_$tag")
    p.toFile.deleteOnExit()
    p.toString + "/idx"
  }

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val query: Seq[Double] = emb.orderBy(col("vec_id").asc)
    .limit(1).select(col("embedding").cast(ArrayType(DoubleType)))
    .collect().head.getSeq[Double](0)

  test("persisted probe reproduces the in-query IVF-ADC ranking bit-for-bit") {
    val path = freshPath("biteq")
    val (models, built) = AnnIndex.ensure(emb, "vec_id", "embedding",
      emb, params, path)
    assert(built, "first ensure must build")
    val persisted = AnnIndex.probe(spark, path, models, query,
      nprobe = 3, n = 10).collect().map(_.toSeq)
    val inQuery = ProductQuantizer.ivfAdcTopK(emb, "vec_id", "embedding",
      models.coarse, models.pq, query, nprobe = 3, n = 10)
      .collect().map(_.toSeq)
    // rows, order, and every double bit pattern must agree
    assert(persisted.toSeq === inQuery.toSeq)
    assert(persisted.nonEmpty)
  }

  test("probe scans ONLY the probed cell directories (partition pruning)") {
    val path = freshPath("prune")
    val (models, _) = AnnIndex.ensure(emb, "vec_id", "embedding",
      emb, params, path)
    val probed = ProductQuantizer.probeCells(models.coarse, query, 3).toSet
    val allCells = spark.read.parquet(s"$path/codes")
      .select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
    assert(allCells.size > 3, s"need >3 occupied cells, got $allCells")
    val df = AnnIndex.probe(spark, path, models, query, nprobe = 3, n = 10)
    df.collect()
    // df.inputFiles reports the relation's FULL file listing (it does
    // not apply partition pruning), so the evidence must come from the
    // executed scan node: its numFiles metric counts only the files
    // the pruned scan actually planned
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = finalPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, finalPlan.toString)
    val filesScanned = scans.map(_.metrics("numFiles").value).sum
    val filesTotal = df.inputFiles.length.toLong
    assert(filesScanned > 0)
    assert(filesScanned < filesTotal,
      s"scan read $filesScanned of $filesTotal files — no pruning happened")
    // exactly the probed cells' files, no more
    val filesExpected = df.inputFiles.count(f =>
      probed.exists(c => f.contains(s"/cell=$c/"))).toLong
    assert(filesScanned === filesExpected,
      s"scan read $filesScanned files; probed dirs hold $filesExpected")
    // and the scan node itself carries the cell partition filter
    val planStr = scans.map(_.toString).mkString("\n")
    assert(planStr.contains("PartitionFilters") && planStr.contains("cell"),
      planStr)
    assert(probed.size === 3)
  }

  test("ensure reuses a matching index and rebuilds on corpus drift") {
    val path = freshPath("reuse")
    val (m1, b1) = AnnIndex.ensure(emb, "vec_id", "embedding",
      emb, params, path)
    assert(b1)
    val (m2, b2) = AnnIndex.ensure(emb, "vec_id", "embedding",
      emb, params, path)
    assert(!b2, "same corpus + params must reuse the persisted index")
    assert(m2.coarse === m1.coarse)
    assert(m2.pq === m1.pq)
    // a different corpus (one row dropped) must force a rebuild
    val drifted = emb.filter(col("vec_id") =!= 0)
    val (_, b3) = AnnIndex.ensure(drifted, "vec_id", "embedding",
      drifted, params, path)
    assert(b3, "fingerprint drift must rebuild")
    // …and different hyperparameters likewise
    val (_, b4) = AnnIndex.ensure(drifted, "vec_id", "embedding",
      drifted, params.copy(nprobeDefault = 5), path)
    assert(b4, "param drift must rebuild")
  }

  test("loadModels: absent or malformed index reads as None, never throws") {
    assert(AnnIndex.loadModels(spark, "/nonexistent/nowhere").isEmpty)
    val path = freshPath("garbage")
    // a model table with no meta row
    spark.range(3).selectExpr("'coarse' AS kind", "cast(-1 as int) AS sub",
      "cast(id as int) AS cluster", "array(cast(id as double)) AS vec")
      .write.mode("overwrite").parquet(s"$path/model")
    assert(AnnIndex.loadModels(spark, path).isEmpty)
  }
}
