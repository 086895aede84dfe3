package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CROSS-RUN incremental dedup — the state the one-shot operators
  * ([[Dedup.exact]], [[ParagraphDedup]]) lack: a production pipeline
  * dedups every new crawl batch against everything already accepted,
  * and at 100 TB the accepted-corpus fingerprint set is itself a huge
  * table that must not be re-shuffled per batch.
  *
  * The state is therefore PERSISTED BUCKETED by fingerprint
  * ([[graft.sources.Bucketing]]): the shuffle that aligns state rows
  * to join buckets is paid ONCE at write time, and every subsequent
  * batch-vs-state join reads the state pre-partitioned — zero
  * exchange on the state side of the executed plan (spec-pinned: no
  * ShuffleExchange node has the state scan in its subtree). Only the
  * BATCH side moves: it is exchanged (or broadcast, when small) to
  * meet the state's bucketing — work proportional to the increment,
  * never to the corpus.
  *
  * Staleness discipline matches [[graft.sim.AnnIndex]]: the state
  * table carries a corpus fingerprint (exact long count + id-hash
  * sum) in table properties; [[ensureState]] rebuilds when it
  * disagrees, so a drifted corpus can never silently serve stale
  * ownership.
  */
object IncrementalDedup {

  /** First-occurrence ownership of the accepted corpus: one row per
    * distinct content fingerprint, owned by the minimum id — the
    * exact-dedup state table. One hash-aggregate shuffle.
    */
  def stateOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint60(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("owner_id"))

  private def fingerprint(docs: DataFrame, idCol: String): (Long, Long) = {
    val r = docs.select(count(lit(1)),
      sum(TextAnalysis.hash60(col(idCol).cast("string")))).collect().head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Persist (or reuse) the bucketed ownership state for `docs` as
    * managed table `table`. Reuses iff the stored corpus fingerprint
    * matches; returns true when a (re)build happened.
    */
  def ensureState(docs: DataFrame, idCol: String, textCol: String,
      table: String, nBuckets: Int): Boolean = {
    val spark = docs.sparkSession
    val (n, h) = fingerprint(docs, idCol)
    val fresh =
      try {
        val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        props.get("graft.fp_n").contains(n.toString) &&
          props.get("graft.fp_h").contains(h.toString)
      } catch { case scala.util.control.NonFatal(_) => false }
    if (!fresh) {
      // external location (tmp) + drop-first overwrite: the session
      // catalog is in-memory, so a NEW JVM has forgotten the table
      // while its directory survives — a managed saveAsTable would
      // fail on the leftover location. The rebuild-per-process is a
      // catalog-architecture fact, not a layout one: Spark only plans
      // bucketed scans for catalog tables, so cross-process reuse of
      // the bucketing needs a persistent metastore (which production
      // clusters have; the local harness does not).
      val loc = s"${System.getProperty("java.io.tmpdir")}/graft_incr_state/" +
        table.replaceAll("[^A-Za-z0-9_]", "_")
      graft.sources.Bucketing.writeBucketed(
        stateOf(docs, idCol, textCol), table,
        bucketCols = Seq("fp"), nBuckets = nBuckets, sortCols = Seq("fp"),
        path = Some(loc))
      spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES(" +
        s"'graft.fp_n'='$n','graft.fp_h'='$h')")
    }
    !fresh
  }

  /** Dedup `batch` against the persisted state AND within itself:
    * every batch row is classified
    *
    *  - `dup_of_state` — its content fingerprint is already owned by
    *    an accepted document (owner_id = the state owner);
    *  - `dup_in_batch` — first seen in THIS batch, but an earlier
    *    batch row (min id) owns the fingerprint;
    *  - `kept` — the batch's first occurrence of content the state
    *    has never seen (owner_id = its own id).
    *
    * Plan shape: the within-batch ownership is a batch-sized
    * hash-aggregate; the state join streams the bucketed table with
    * ZERO state-side exchange. Output: (idCol, fp, status, owner_id).
    */
  def dedupAgainst(spark: SparkSession, table: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val state = spark.table(table)
      .select(col("fp"), col("owner_id").as("__state_owner"))
    val b = batch.select(col(idCol),
      TextAnalysis.fingerprint60(col(textCol)).as("fp"))
    val batchOwn = b.groupBy(col("fp"))
      .agg(min(col(idCol)).as("__batch_owner"))
    b.join(batchOwn, Seq("fp"))
      .join(state, Seq("fp"), "left")
      .select(col(idCol), col("fp"),
        when(col("__state_owner").isNotNull, lit("dup_of_state"))
          .when(col(idCol) =!= col("__batch_owner"), lit("dup_in_batch"))
          .otherwise(lit("kept")).as("status"),
        coalesce(col("__state_owner"), col("__batch_owner"))
          .as("owner_id"))
  }

  /** The accepted rows of a classified batch — what the pipeline
    * appends to the corpus (and whose fingerprints join the state on
    * the next [[ensureState]]).
    */
  def kept(classified: DataFrame): DataFrame =
    classified.filter(col("status") === "kept")
}
