package graft.ops

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Footer-level layout auditing — measures what a clustered layout
  * actually buys a reader: parquet row-group pruning works off the
  * per-row-group min/max statistics, so the quality of a clustering
  * walk (Hilbert vs Z-order vs none) is EXACTLY "how many row groups'
  * [min,max] envelopes intersect a query box". This reads the same
  * footer statistics the scan planner consults, making the
  * HilbertSpec skip-rate comparison a measurement, not a proxy.
  */
object LayoutAudit {

  /** (xmin, xmax, ymin, ymax, rows) per row group under `dir`, from
    * the parquet footers. Both columns must be INT64 (write them as
    * Long). Bounded driver state: one 5-tuple per row group.
    */
  def rowGroupEnvelopes(spark: SparkSession, dir: String, xCol: String,
      yCol: String): Seq[(Long, Long, Long, Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.getName.toString)
    files.toSeq.flatMap { p =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        rdr.getFooter.getBlocks.asScala.toSeq.map { block =>
          def bounds(name: String): (Long, Long) = {
            val cc = block.getColumns.asScala
              .find(_.getPath.toDotString == name)
              .getOrElse(throw new IllegalArgumentException(
                s"column '$name' not found in $p"))
            val st = cc.getStatistics
            require(st != null && !st.isEmpty,
              s"no statistics for '$name' in $p — footer stats disabled?")
            (st.genericGetMin.asInstanceOf[Number].longValue(),
              st.genericGetMax.asInstanceOf[Number].longValue())
          }
          val (x0, x1) = bounds(xCol)
          val (y0, y1) = bounds(yCol)
          (x0, x1, y0, y1, block.getRowCount)
        }
      } finally rdr.close()
    }
  }

  /** Row groups a reader MUST fetch for the box query
    * `x ∈ [qx0, qx1] AND y ∈ [qy0, qy1]` — envelope intersection,
    * the planner's row-group pruning rule.
    */
  def mustReadGroups(envs: Seq[(Long, Long, Long, Long, Long)],
      qx0: Long, qx1: Long, qy0: Long, qy1: Long): Int =
    envs.count { case (x0, x1, y0, y1, _) =>
      x1 >= qx0 && x0 <= qx1 && y1 >= qy0 && y0 <= qy1
    }
}
