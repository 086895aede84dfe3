package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent partitioned parquet ingest — the Spark analog of the
  * reference's delete-then-reload API-pull idempotency (each pull
  * deletes its (state, source, statcat, year) slice before COPY,
  * reference: src/nass.mk:107). Dynamic partition overwrite replaces
  * exactly the partitions present in `df`, leaving all others intact —
  * re-running a pull is a no-op-equivalent, and the layout doubles as
  * the table's partition pruning key at scale.
  */
object ParquetSink {
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    // per-writer option, NOT a session-conf set/restore: two concurrent
    // writers in one session (e.g. two foreachBatch sinks) would race
    // on the global conf, and a writer caught in "static" mode deletes
    // the ENTIRE target directory instead of only its partitions
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Write parquet with ROW-GROUP BLOOM FILTERS on the named columns —
    * the file-format-level sibling of [[graft.ops.BloomJoin]]'s
    * runtime filter: a point-lookup (`key = x`) on a bloom-equipped
    * column skips every row group whose filter rejects the value,
    * WITHOUT relying on min/max stats (which are useless for
    * high-cardinality unsorted keys, exactly where blooms shine). At
    * 100 TB this turns needle-in-haystack audits (find one doc id,
    * one user) from full-column scans into footer+filter probes.
    *
    * Costs are write-side and bounded: one filter of `ndv`-scaled
    * size per (row group, column). The spec verifies the footer
    * actually carries the filters (offset/length present) and that
    * filtered reads stay correct.
    */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
      ndv: Long = 100000L): Unit = {
    require(bloomCols.nonEmpty, "name at least one bloom column")
    val w = bloomCols.foldLeft(df.write.mode("overwrite")) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }

  /** Small-file compaction — the operational staple of any
    * continuously-ingested layout: streaming micro-batches and
    * per-pull idempotent writes each leave a few small files per
    * partition, and a year of them turns every scan into a
    * metadata/task-overhead bath (10⁶ × 1 MB files plan 10⁶ tasks for
    * what 10⁴ × 100 MB files do in 10⁴). Rewrites the dataset so each
    * partition holds ≈ ceil(bytes/targetBytes) files.
    *
    * How: one filesystem listing maps each partition directory to its
    * current byte size (bounded driver state — one entry per
    * partition); each row gets a salt in [0, nFiles_of_its_partition)
    * from a hash of its content, and ONE shuffle on
    * (partitionCols, salt) routes rows so every output slot is a task
    * = a file. The compacted layout is written to a sibling temp
    * directory and swapped in by two renames (Spark refuses to
    * overwrite a path it is reading, and the swap makes the rewrite
    * restartable: a crash leaves either the old layout or the temp
    * dir, never a half-deleted table; plain parquet has no
    * multi-directory transaction, which is documented rather than
    * papered over). Row content is untouched: compaction is
    * layout-only, verified by the spec's content-equality gate.
    * Partition values must round-trip through their directory names
    * (no URL-escaped specials) — true for the numeric/date/id
    * partition keys this engine lays out.
    *
    * Returns (filesBefore, filesAfter) from the listings.
    *
    * Safety gates: the rewrite read disables partition-column type
    * inference in a cloned session (so a string partition value can
    * never be silently retyped and re-laid-out), a row-count AND
    * (name, type, order) schema gate must pass before the swap, the
    * two swap renames report failure separately (each message names
    * where the data actually lives), and the backup copy is retained
    * until the swapped-in layout re-validates — or indefinitely with
    * `keepBackup = true`.
    */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
      targetBytes: Long, keepBackup: Boolean = false): (Long, Long) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // qualify so URI relativization below sees one consistent scheme
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(path))
    // leaf data files, keyed by their partition-relative directory
    val it = fs.listFiles(root, true)
    val sizes = scala.collection.mutable.Map.empty[String, (Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val rel = root.toUri.relativize(st.getPath.getParent.toUri).getPath
        val (b, n) = sizes.getOrElse(rel, (0L, 0L))
        sizes(rel) = (b + st.getLen, n + 1)
      }
    }
    val filesBefore = sizes.valuesIterator.map(_._2).sum
    // Rewrite read runs in a CLONED session with partition-column type
    // inference OFF: with inference on, a string partition value '1'
    // reads back as int and is WRITTEN BACK as int ('01' would even
    // change directory names) — a value-preserving schema drift the
    // row-count gate cannot see. Inference-off keeps partition values
    // as the literal directory strings, so the rewritten layout's
    // directory names are byte-identical and downstream readers (with
    // or without inference) see exactly the pre-compaction schema.
    // newSession() shares the SparkContext but owns its conf — the
    // caller's session conf is untouched.
    val rs = spark.newSession()
    rs.conf.set(
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val df = rs.read.parquet(path)
    // (name, type, order) of the layout being replaced — the schema
    // gate below holds the rewrite to this
    val wantSchema = df.schema.map(f => (f.name, f.dataType))
    val salted =
      if (partitionCols.isEmpty) {
        val n = math.max(1L,
          (sizes.valuesIterator.map(_._1).sum + targetBytes - 1) / targetBytes)
        df.repartition(n.toInt)
      } else {
        // per-partition file budget, joined in via a tiny literal map
        // (one row per partition — the bounded-model-state class).
        // Directory names carry the layout's OWN column order — verify
        // it against the caller's list instead of trusting positions
        // (a swapped partitionCols order would otherwise mis-key every
        // budget row and the inner join below would drop the corpus).
        val dirCols = sizes.keysIterator.next()
          .split("/").filter(_.nonEmpty).map(_.split("=", 2)(0)).toSeq
        require(dirCols == partitionCols,
          s"partitionCols $partitionCols must match the on-disk layout " +
            s"order $dirCols")
        val budgets = sizes.toSeq.map { case (rel, (bytes, _)) =>
          val vals = rel.split("/").filter(_.nonEmpty).map(_.split("=", 2)(1))
          val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
          org.apache.spark.sql.Row.fromSeq(vals.toSeq :+ n)
        }
        val schema = org.apache.spark.sql.types.StructType(
          partitionCols.map(c =>
            org.apache.spark.sql.types.StructField(c + "__s",
              org.apache.spark.sql.types.StringType)) :+
            org.apache.spark.sql.types.StructField("__nf",
              org.apache.spark.sql.types.LongType))
        val bdf = rs.createDataFrame(
          java.util.Arrays.asList(budgets: _*), schema)
        // NULL partition values are laid out as the Hive default token;
        // coalesce so those rows still find their budget row (a plain
        // equality would silently drop them from the rewrite)
        val joinCond = partitionCols.map(c =>
          coalesce(col(c).cast("string"),
            lit("__HIVE_DEFAULT_PARTITION__")) === col(c + "__s"))
          .reduce(_ && _)
        val slots = sizes.valuesIterator.map { case (b, _) =>
          math.max(1L, (b + targetBytes - 1) / targetBytes) }.sum
        df.join(broadcast(bdf), joinCond)
          .withColumn("__salt",
            pmod(hash(struct(df.columns.map(col): _*)).cast("long"),
              col("__nf")))
          .repartition(math.max(1L, slots).toInt,
            partitionCols.map(col) :+ col("__salt"): _*)
          .drop((partitionCols.map(_ + "__s") ++ Seq("__nf", "__salt")): _*)
      }
    val tmp = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val writer = salted.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(tmp.toString)
    // HARD row-count + schema gates before anything is deleted:
    // compaction is layout-only by contract, and a count mismatch OR
    // a (name, type, order) drift in the rewrite (whatever the cause)
    // must abort with the original data untouched rather than swap in
    // a truncated or retyped table
    val nIn = df.count()
    val back = rs.read.parquet(tmp.toString)
    val nOut = back.count()
    val gotSchema = back.schema.map(f => (f.name, f.dataType))
    if (nIn != nOut || gotSchema != wantSchema) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction aborted for $path: rewrote $nOut of $nIn rows, " +
          s"schema $gotSchema vs $wantSchema — original layout untouched")
    }
    if (fs.exists(bak)) fs.delete(bak, true)
    // Two renames, reported SEPARATELY so a failure names where the
    // data actually is (on object stores rename is a non-atomic copy;
    // this is a documented best-effort swap, not a transaction):
    //  rename 1 fails → data never moved, still live at root;
    //  rename 2 fails → attempt rollback, report root vs bak honestly.
    if (!fs.rename(root, bak))
      throw new IllegalStateException(
        s"compaction swap failed for $path: could not move the current " +
          s"layout aside — data is STILL LIVE at $root; compacted copy " +
          s"left at $tmp")
    if (!fs.rename(tmp, root)) {
      val rolledBack = fs.rename(bak, root)
      throw new IllegalStateException(
        if (rolledBack)
          s"compaction swap failed for $path: compacted layout could not " +
            s"move into place; ROLLED BACK — original data live at $root, " +
            s"compacted copy at $tmp"
        else
          s"compaction swap failed for $path: table directory is EMPTY — " +
            s"original data at $bak, compacted copy at $tmp; rename $bak " +
            s"back to $root to recover")
    }
    // the backup is the ONLY rollback copy — retain it until the
    // swapped-in layout re-validates (and permanently with keepBackup)
    val swapped = rs.read.parquet(root.toString)
    val nSwapped = swapped.count()
    val swappedSchema = swapped.schema.map(f => (f.name, f.dataType))
    if (nSwapped != nIn || swappedSchema != wantSchema)
      throw new IllegalStateException(
        s"post-swap validation failed for $path: $nSwapped of $nIn rows, " +
          s"schema $swappedSchema vs $wantSchema — rollback copy retained " +
          s"at $bak")
    if (!keepBackup) fs.delete(bak, true)
    val it2 = fs.listFiles(root, true)
    var filesAfter = 0L
    while (it2.hasNext) {
      val st = it2.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
        filesAfter += 1
    }
    (filesBefore, filesAfter)
  }
}
