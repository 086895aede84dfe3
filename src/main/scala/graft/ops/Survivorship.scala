package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survivorship (golden-record fusion) — the merge step of entity
  * resolution: after clustering (near-dup components, CDC entity
  * groups…), fuse each cluster's member rows into ONE canonical record
  * by per-field rules, rather than electing a single member row (that
  * is `q_dedup_best`'s job). Classic MDM survivorship: "longest" for
  * free text, "most frequent" for categorical fields, "sum" for
  * additive measures — each rule deterministic so two engines fuse
  * bit-identically.
  *
  * Scale shape: everything is partial-aggregatable keyed shuffles on
  * cluster_id — no windows. "Longest text" is one lexicographic
  * struct-max (length, -id); "most frequent" needs a per-(cluster,
  * value) count, then a per-cluster max joined back to break ties by
  * the SMALLEST value — two map-side-combinable aggregations plus one
  * broadcast-or-shuffle join each, chosen over a window row_number
  * because a per-cluster sort cannot partial-aggregate and a hot
  * cluster (the usual skew case: the empty-string entity) would pin
  * one task.
  */
object Survivorship {

  /** One golden record per cluster.
    *
    * @param df         member rows, one per record
    * @param clusterCol cluster assignment column (e.g. from
    *                   [[graft.dedup.Dedup.duplicateClusters]])
    * @param idCol      record id (bigint; ties break toward smallest)
    * @param textCol    free-text field fused by longest-wins
    * @param modalCols  categorical fields fused by most-frequent-wins
    *                   (ties toward the smallest value; NULLs ignored)
    * @param sumCols    additive bigint fields fused by sum
    * @return cluster_id, n_members, canonical_id, canonical_len,
    *         modal_<c>…, sum_<c>…
    */
  def goldenRecords(df: DataFrame, clusterCol: String, idCol: String,
      textCol: String, modalCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val base = graft.CacheRegistry.register(
      df.select((Seq(clusterCol, idCol, textCol) ++ modalCols ++ sumCols)
        .map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // longest text wins, ties to smallest id: max(struct(len, -id))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_members"),
        max(struct(length(col(textCol)).as("len"),
          (-col(idCol)).as("nid"))).as("w")) ++
        sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    val core = base.groupBy(col(clusterCol).as("cluster_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(Seq(col("cluster_id"), col("n_members"),
        (-col("w.nid")).as("canonical_id"),
        col("w.len").cast("bigint").as("canonical_len")) ++
        sumCols.map(c => col(s"sum_$c")): _*)
    // most-frequent value per categorical field: per-(cluster, value)
    // count → per-cluster top count → smallest value at that count
    val modal = modalCols.map { c =>
      val cnt = base.filter(col(c).isNotNull)
        .groupBy(col(clusterCol).as("cluster_id"), col(c).as("v"))
        .agg(count(lit(1)).as("c"))
      val top = cnt.groupBy(col("cluster_id")).agg(max(col("c")).as("mc"))
      cnt.join(top, Seq("cluster_id"))
        .filter(col("c") === col("mc"))
        .groupBy(col("cluster_id"))
        .agg(min(col("v")).as(s"modal_$c"))
    }
    // all-NULL categorical clusters fall out of `modal` — LEFT joins
    // keep the cluster with a NULL fused value, faithful to "no data"
    modal.foldLeft(core)((acc, m) => acc.join(m, Seq("cluster_id"), "left"))
  }
}
