package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lake-maintenance operators: the MERGE-INTO / dimension-history
  * primitives a parquet lake needs without a table format's transaction
  * log. They complement the incremental family (snapshotDiff,
  * incremental scores/dedup): those compute WHAT changed; these apply
  * changes to produce the next snapshot. */
object LakeOps {

  /** MERGE upsert: next snapshot = update rows (minus deletes) plus
    * every base row whose key is untouched. The canonical
    * write-side compaction of a CDC/nightly batch into a snapshot —
    * rewritten wholesale here because plain parquet has no row-level
    * delete; pair with partition pruning upstream to rewrite only
    * touched partitions.
    *
    * Plan: ONE anti join of the base on the update key set (AQE
    * broadcasts it when the batch is small — the usual case) plus a
    * union; nothing else touches the base bytes. `deletedCol`, if
    * given, names a boolean column in `updates`: true rows delete the
    * key outright (they are removed from the output and do not
    * re-insert).
    *
    * Output: the base schema (updates must carry the same columns,
    * plus the optional flag). */
  def mergeUpsert(base: DataFrame, updates: DataFrame, keyName: String,
      deletedCol: Option[String] = None): DataFrame = {
    // a NULL delete flag is "not a delete": without the coalesce the
    // filter drops NULL-flag rows from re-insertion while their keys
    // stay in `touched`, silently removing the base row
    val upserts = deletedCol match {
      case Some(c) => updates.filter(!coalesce(col(c), lit(false))).drop(c)
      case None => updates
    }
    require(upserts.columns.sorted.sameElements(base.columns.sorted),
      s"update schema ${upserts.columns.mkString(",")} must match base ${base.columns.mkString(",")}")
    val touched = updates.select(col(keyName)).distinct()
    base.join(touched, Seq(keyName), "left_anti")
      .unionByName(upserts.select(base.columns.map(col): _*))
  }

  /** CDC apply with OUT-OF-ORDER change streams: collapse a change log
    * carrying multiple versions per key — inserts, updates, delete
    * tombstones, in any arrival order — to latest-wins by a sequence
    * column, then merge onto the base. The semantics a Debezium-style
    * feed needs that single-batch [[mergeUpsert]] cannot express:
    * U@1 then U@2 keeps only @2; U@1 then D@2 deletes; D@1 then I@2
    * RESURRECTS the key with @2's payload. Ties on `seqName` break by
    * op ascending (pinned; feeds should make the sequence unique per
    * key — document yours).
    *
    * Plan: one window rank PER KEY over the change log (changes-sized,
    * not base-sized), one anti join of the base on the touched key
    * set, one union — base bytes are never shuffled. `opName` values:
    * 'I'/'U' upsert the payload, 'D' removes the key.
    * Output: the base schema. */
  def cdcApply(base: DataFrame, changes: DataFrame, keyName: String,
      seqName: String, opName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payloadCols = changes.columns.filter(c => c != seqName && c != opName)
    require(payloadCols.sorted.sameElements(base.columns.sorted),
      s"change payload ${payloadCols.mkString(",")} must match base " +
        s"${base.columns.mkString(",")} (plus $seqName, $opName)")
    val w = Window.partitionBy(col(keyName))
      .orderBy(col(seqName).desc, col(opName).asc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val applied = latest.where(upper(col(opName)) =!= "D")
      .select(base.columns.map(col): _*)
    base.join(latest.select(col(keyName)).distinct(), Seq(keyName), "left_anti")
      .unionByName(applied)
  }

  /** Write-audit-publish: the staged-commit discipline production lake
    * pipelines run so a bad batch can NEVER reach readers. The batch
    * lands in an unadvertised staging directory, the audit runs over
    * the READ-BACK of what actually hit disk (not the input plan —
    * write-path bugs are exactly what WAP exists to catch), and only a
    * clean audit appends the staging path to the `_published.list`
    * manifest — written whole to a temp file and atomically renamed
    * over the old one, so readers see the previous or the new list,
    * never a torn one. A failed audit leaves the batch quarantined in
    * staging (operator-inspectable, invisible to [[readPublished]]).
    * Returns (published, violations). */
  def writeAuditPublish(df: DataFrame, dir: String,
      audit: DataFrame => Seq[String]): (Boolean, Seq[String]) = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val existing = publishedList(fs, root)
    val stage = f"_staged_${existing.size}%05d"
    df.write.mode("overwrite").parquet(s"$dir/$stage")
    val violations = audit(spark.read.parquet(s"$dir/$stage"))
    if (violations.nonEmpty) (false, violations)
    else {
      val tmp = new org.apache.hadoop.fs.Path(root, "_published.list.tmp")
      val out = fs.create(tmp, true)
      out.write((existing :+ stage).mkString("\n").getBytes("UTF-8"))
      out.close()
      val fin = new org.apache.hadoop.fs.Path(root, "_published.list")
      fs.delete(fin, false)
      require(fs.rename(tmp, fin), s"manifest rename failed at $fin")
      (true, Nil)
    }
  }

  /** Union of every batch [[writeAuditPublish]] has published under
    * `dir` — quarantined staging directories are invisible here. */
  def readPublished(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batches = publishedList(fs, root)
    require(batches.nonEmpty, s"no published batches under $dir")
    batches.map(b => spark.read.parquet(s"$dir/$b")).reduce(_.unionByName(_))
  }

  private def publishedList(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[String] = {
    val fin = new org.apache.hadoop.fs.Path(root, "_published.list")
    if (!fs.exists(fin)) Seq.empty
    else {
      val in = fs.open(fin)
      val text = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      in.close()
      text.split("\n").toSeq.filter(_.nonEmpty)
    }
  }

  /** Plain-parquet TIME TRAVEL over a CDC ledger: `dir/base` is the
    * oldest full snapshot, `dir/batch=i` (i = 1..) are ordered CDC
    * batches in [[mergeUpsert]]'s shape (key + payload + optional delete
    * flag). `snapshotAsOf(k)` folds the first `k` batches over the base —
    * the as-of read a table format answers from its log, re-expressed
    * for a bare parquet lake where history IS the retained batch files.
    *
    * Cost: k chained anti-joins, each ∝ current + batch (AQE broadcasts
    * result-sized batches). At 100 TB keep the fold short by periodically
    * compacting the ledger — rewrite `base` as `snapshotAsOf(latest)`
    * ([[Layout.compact]] pass) and drop the folded batches; time travel
    * depth then bounds k, exactly the checkpoint-vs-log trade every
    * table format makes. */
  def snapshotAsOf(spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int, keyName: String, deletedCol: Option[String] = None): DataFrame = {
    require(k >= 0, "snapshot index must be >= 0")
    (1 to k).foldLeft(spark.read.parquet(s"$dir/base")) { (snap, i) =>
      mergeUpsert(snap, spark.read.parquet(s"$dir/batch=$i"), keyName, deletedCol)
    }
  }

  /** LEDGER COMPACTION — the checkpoint half of [[snapshotAsOf]]'s
    * checkpoint-vs-log trade: materialize the fold of batches 1..`upTo`
    * as the new `base`, drop the folded batch dirs, and renumber the
    * remaining batches to start at 1. Time travel BEFORE the compaction
    * point is given up (exactly Delta's VACUUM/checkpoint semantics);
    * everything after replays as before with a shorter fold. The swap
    * is write-new → delete-old → rename, not atomic — run it from the
    * single maintenance writer that owns the lake (the same ownership
    * [[graft.streaming.JdbcUpsertSink.upsertBatch]] documents). */
  def compactLedger(spark: org.apache.spark.sql.SparkSession, dir: String,
      upTo: Int, keyName: String, deletedCol: Option[String] = None): Unit = {
    require(upTo >= 1, "upTo must be >= 1")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    require(fs.exists(p(s"batch=$upTo")), s"ledger has no batch=$upTo under $dir")
    snapshotAsOf(spark, dir, upTo, keyName, deletedCol)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/base_compacting")
    fs.delete(p("base"), true)
    fs.rename(p("base_compacting"), p("base"))
    (1 to upTo).foreach(i => fs.delete(p(s"batch=$i"), true))
    // renumber the tail so the ledger is contiguous from 1 again
    var j = upTo + 1
    var k = 1
    while (fs.exists(p(s"batch=$j"))) {
      fs.rename(p(s"batch=$j"), p(s"batch=$k"))
      j += 1; k += 1
    }
  }

  /** Type-2 slowly-changing-dimension merge: apply a change batch to a
    * dimension with (key, payload…, valid_from, valid_to) history rows
    * (current row ⇔ valid_to IS NULL). A change whose payload differs
    * from the key's current row CLOSES that row at the change timestamp
    * and opens a new current row; an identical payload is a no-op; a
    * key with no current row inserts one. At most one change per key
    * per batch (the CDC-compacted shape — enforce upstream with a
    * window or [[TemporalJoin]]'s as-of pick).
    *
    * Plan: history rows pass through untouched (they never join);
    * current rows take ONE left join against the key-distinct batch.
    * Cost ∝ current-row count + batch, never the history depth — at
    * 100 TB partition the dimension by is-current so closed history
    * bytes are not even scanned.
    *
    * Output: the input schema; row count grows by exactly the number of
    * effective (differing or new-key) changes. */
  def scd2Merge(dim: DataFrame, changes: DataFrame, keyName: String,
      payloadCols: Seq[String], changeTs: Column): DataFrame = {
    require(payloadCols.nonEmpty, "scd2Merge needs at least one payload column")
    val pay = payloadCols.map(col)
    val ch = changes.select((col(keyName) +: payloadCols.map(c => col(c).as(s"__n_$c")))
      :+ changeTs.as("__ts"): _*)
    val history = dim.filter(col("valid_to").isNotNull)
    val current = dim.filter(col("valid_to").isNull)
    val joined = current.join(ch, Seq(keyName), "left")
    // null-safe compare: a change that sets a payload column to NULL (or
    // replaces a NULL current value) must still register as a change —
    // `=!=` would yield NULL there and the row would silently no-op
    val differs = payloadCols.map(c => !(col(s"__n_$c") <=> col(c)))
      .reduce(_ || _)
    val effective = col("__ts").isNotNull && differs
    // current rows: closed at the change ts when an effective change hits
    val adjusted = joined.select((col(keyName) +: pay :+ col("valid_from") :+
      when(effective, col("__ts")).otherwise(col("valid_to")).as("valid_to")): _*)
    // new current versions for effective changes on existing keys
    val reopened = joined.filter(effective)
      .select((col(keyName) +: payloadCols.map(c => col(s"__n_$c").as(c)) :+
        col("__ts").as("valid_from") :+ lit(null).cast(dim.schema("valid_to").dataType).as("valid_to")): _*)
    // brand-new keys open their first row
    val fresh = ch.join(current.select(col(keyName)), Seq(keyName), "left_anti")
      .select((col(keyName) +: payloadCols.map(c => col(s"__n_$c").as(c)) :+
        col("__ts").as("valid_from") :+ lit(null).cast(dim.schema("valid_to").dataType).as("valid_to")): _*)
    history.select(dim.columns.map(col): _*)
      .unionByName(adjusted.select(dim.columns.map(col): _*))
      .unionByName(reopened.select(dim.columns.map(col): _*))
      .unionByName(fresh.select(dim.columns.map(col): _*))
  }

  /** Incremental view maintenance for a distributive rollup under a CDC
    * batch: maintained = oldAgg ⊖ agg(old rows of touched keys) ⊕
    * agg(surviving new rows of touched keys) — the delta algebra that
    * keeps a 100 TB fact table's rollup current WITHOUT rescanning it
    * (the full scan touches only the touched-key subset, which a real
    * lake reads partition-/bloom-pruned; everything else is
    * rollup-sized). The change log uses [[cdcApply]]'s contract
    * (key, payload, seq, op with latest-wins collapse, 'D' tombstones,
    * resurrection) so the same feed drives both the table merge and the
    * rollup maintenance. Groups whose maintained row count reaches 0
    * drop out — maintained output is IDENTICAL to a from-scratch
    * rollup of the merged table (the e13 gate proves it against a
    * DuckDB recompute, and the spec against Spark's own recompute).
    *
    * `group` must be computable on base and change rows alike;
    * `measures` are (name, value-expression) SUM aggregates (the
    * distributive class this algebra covers — COUNT rides along as
    * `n_rows`). Output: (grp, n_rows, <measure sums>). */
  def maintainRollup(base: DataFrame, changes: DataFrame, keyName: String,
      seqName: String, opName: String, group: Column,
      measures: Seq[(String, Column)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(measures.nonEmpty, "maintainRollup needs at least one measure")
    def rollup(df: DataFrame, sign: Long) =
      df.groupBy(group.as("grp"))
        .agg(sum(lit(sign)).as("__n"),
          measures.map { case (n, c) =>
            sum(c * sign).as(s"__m_$n") }: _*)
    val oldAgg = rollup(base, 1L)
    val w = Window.partitionBy(col(keyName))
      .orderBy(col(seqName).desc, col(opName).asc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val touched = latest.select(col(keyName)).distinct()
    // the only base-table access: the touched-key subset (pruned scan
    // at scale), negated
    val sub = rollup(base.join(touched, Seq(keyName), "left_semi"), -1L)
    val add = rollup(latest.where(upper(col(opName)) =!= "D"), 1L)
    val names = "__n" +: measures.map { case (n, _) => s"__m_$n" }
    val combined = Seq(sub, add).foldLeft(oldAgg) { (acc, d) =>
      val accN = acc.columns.filter(_ != "grp").map(c => col(c).as(s"l_$c"))
      val dN = d.columns.filter(_ != "grp").map(c => col(c).as(s"r_$c"))
      acc.select(col("grp") +: accN.toSeq: _*)
        .join(d.select(col("grp") +: dN.toSeq: _*), Seq("grp"), "full_outer")
        .select(col("grp") +: names.map(c =>
          (coalesce(col(s"l_$c"), lit(0L)) + coalesce(col(s"r_$c"), lit(0L)))
            .as(c)): _*)
    }
    combined.filter(col("__n") > 0)
      .select(col("grp") +: col("__n").as("n_rows") +:
        measures.map { case (n, _) => col(s"__m_$n").as(n) }: _*)
  }
}
