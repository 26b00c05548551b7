package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history maintenance — the APPLY step of
  * incremental sync. [[Validators.snapshotDiff]] detects what changed
  * between agent runs; this operator folds each new snapshot into a
  * versioned history table (validity intervals instead of overwrites),
  * which is how a warehouse target keeps every state the reference's
  * continuous source→target sync ever shipped
  * (/root/reference/src/main/scala/com/wegtam/tensei/agent/Processor.scala
  * drives repeated full-table runs; the history semantics are the standard
  * Kimball SCD type 2).
  *
  * Contract: `valid_from`/`valid_to` are ISO date strings; an open (current)
  * row has `valid_to IS NULL`. Snapshots are COMPLETE states of the source
  * (a key absent from the snapshot means deleted at the source).
  *
  * 100 TB shape: one full-outer join of the OPEN slice against the snapshot
  * on the key columns (both sides hash-partition on the same keys — the
  * diff, the close and the open all reuse that co-partitioning) plus a
  * pass-through union of the closed slice, which never reshuffles. Change
  * detection compares a codegen'd xxhash64 of the tracked columns, so wide
  * rows diff without shipping their payload twice.
  */
object Scd2 {

  /** Start a history from the first snapshot: every row open since `ts`. */
  def init(snap: DataFrame, ts: String): DataFrame =
    snap.withColumn("valid_from", lit(ts))
      .withColumn("valid_to", lit(null).cast("string"))

  /** Fold the complete snapshot `snap` (state of the source at `ts`) into
    * SCD2 history `scd`. Unchanged open rows persist; changed keys close
    * their open row at `ts` and open a fresh version; keys missing from the
    * snapshot close at `ts`; new keys open at `ts`. Closed rows pass
    * through untouched. Null-safe change compare (NULL == NULL, like
    * IS NOT DISTINCT FROM).
    */
  def merge(scd: DataFrame, snap: DataFrame, keys: Seq[String],
            compareCols: Seq[String], ts: String): DataFrame = {
    val dataCols = keys ++ compareCols
    require(snap.columns.toSeq == dataCols,
      s"snapshot columns must be exactly keys ++ compareCols ($dataCols), got ${snap.columns.toSeq}")
    require(scd.columns.toSeq == dataCols ++ Seq("valid_from", "valid_to"),
      s"scd columns must be keys ++ compareCols ++ (valid_from, valid_to), got ${scd.columns.toSeq}")
    val open = scd.filter(col("valid_to").isNull)
    val closed = scd.filter(col("valid_to").isNotNull)
    val diff = Validators.snapshotDiff(
      open.select(dataCols.map(col): _*), snap, keys, compareCols)
    // null-safe key joins: equi-joins never match NULL keys, so an open
    // null-keyed row would land in NEITHER keep nor close and silently
    // vanish from the history (r8 review). The diff side's keys are
    // RENAMED (__d_*) before joining — diff derives from open/snap, so
    // unrenamed columns would trip the ambiguous-self-join detector.
    def ofStatus(statuses: String*) =
      diff.filter(col("status").isin(statuses: _*))
        .select(keys.map(k => col(k).as(s"__d_$k")): _*)
    // bare-name resolution on the left (dataset-addressed open(k)/snap(k)
    // columns would trip the ambiguous-self-join detector, since the diff
    // side's plan descends from the same datasets)
    val keyCond = keys.map(k => col(k) <=> col(s"__d_$k")).reduce(_ && _)
    val keep = open.join(ofStatus("same"), keyCond)
      .select(scd.columns.map(col): _*)
    val close = open.join(ofStatus("changed", "removed"), keyCond)
      .withColumn("valid_to", lit(ts))
      .select(scd.columns.map(col): _*)
    val opened = snap.join(ofStatus("changed", "added"), keyCond)
      .withColumn("valid_from", lit(ts))
      .withColumn("valid_to", lit(null).cast("string"))
      .select(scd.columns.map(col): _*)
    closed.unionByName(keep).unionByName(close).unionByName(opened)
  }

  /** SCD type-1 merge — the everyday `MERGE INTO target USING source WHEN
    * MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`: source rows win on
    * key match (no history kept), unmatched target rows pass through.
    * One left-anti join on the keys plus a union; both sides hash-partition
    * on the same keys, so at any scale this is a single co-partitioned
    * shuffle pair and no wide row ships twice.
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.toSeq == source.columns.toSeq,
      s"target/source columns must match: ${target.columns.toSeq} vs ${source.columns.toSeq}")
    // NULL-SAFE key match (IS NOT DISTINCT FROM), like [[merge]] since r8:
    // a plain equi-anti-join never matches a NULL key, so a null-keyed
    // target row would survive every apply while the source's null-keyed
    // winner appends AGAIN — one duplicate per re-application, breaking
    // the idempotence toUpsertSink's exactly-once story rests on. (ANSI
    // MERGE shares the null-unsafe bug; a CDC apply must not.) The source
    // keys are renamed before joining — both frames may share lineage,
    // and unrenamed null-safe conditions trip the ambiguous-self-join
    // detector (r8 lesson).
    // the rename prefix must be ABSENT from the schema: a real column
    // already named __s_<key> would make the join condition resolve both
    // sides against the source's renamed column (always equal — every
    // target row anti-joins away)
    val clash = keys.map(k => s"__s_$k").filter(target.columns.contains)
    require(clash.isEmpty,
      s"upsert: column(s) ${clash.mkString(",")} collide with the reserved " +
        "__s_<key> rename prefix; rename them before calling upsert")
    val srcKeys = source.select(keys.map(k => col(k).as(s"__s_$k")): _*)
    val keyCond = keys.map(k => col(k) <=> col(s"__s_$k")).reduce(_ && _)
    target.join(srcKeys, keyCond, "left_anti")
      .unionByName(source)
  }
}
