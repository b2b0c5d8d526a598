package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LSM-style compaction for the `batch_id`-partitioned parquet stores
  * the incremental dedup pipelines append to every micro-batch
  * ([[IncrementalDedup]]'s band/shingle tables, [[IncrementalSemDedup]]'s
  * store/removed tables) — the same conf'd trigger policy as the chess
  * entry store (`StreamingImport`) and the IVF layout
  * (`IvfIndex.compactEpochs`), applied to the one place it matters most:
  * these stores are RE-READ on every micro-batch, so one partition per
  * batch forever is unbounded file-count growth (listing RPCs, footer
  * reads, scheduler tasks) on the hottest read path of a long-running
  * deployment.
  *
  * Layout contract: real batches land under `batch_id=N` (N ≥ 0) via
  * dynamic partition overwrite — the replay-idempotence scheme.
  * Compaction folds every live row with `batch_id < frontier` into the
  * single partition `batch_id = -frontier` (negative ids can never
  * collide with a real batch), then PUBLISHES the fold by creating the
  * marker file `_compacted_<frontier>` — file creation is atomic on
  * local FS, HDFS and object stores, so there is no rename-a-directory
  * dance — and finally sweeps the folded partitions. Readers resolve
  * liveness from the highest marker m:
  * `live = (batch_id = -m) ∪ {batch_id ≥ m}`. A crash between any two
  * steps leaves either the old view (marker unpublished: the half-built
  * `-frontier` partition is invisible because readers only ever look at
  * `-m`) or the new view (marker published: stale folded partitions are
  * filtered out until the next sweep deletes them) — never duplicates,
  * never loss.
  *
  * Replay idempotence is PRESERVED: [[maybeCompact]] runs inside
  * `processBatch(B)` with `frontier = B`, and every `batch_id < B` is
  * already checkpoint-committed (Structured Streaming only advances to
  * B after B-1 commits), so the fold contains exactly the
  * strictly-earlier batches; a replayed B still reads exactly
  * `batches < B` (now as the `-B` partition) and still rewrites only its
  * own `batch_id=B` partition.
  *
  * Concurrency note: within one stream, reads/compaction/sweeps are
  * serialized by foreachBatch. An EXTERNAL concurrent reader must use
  * [[snapshotRead]]: plain [[liveRows]] is marker-filtered (published
  * sweeps are invisible to it) but can race a sweep's physical deletes
  * between its file listing and its scan; snapshotRead closes that race
  * by retrying the whole resolve-and-scan when the scan trips over a
  * swept file.
  */
object BatchStore {

  private val MarkerPrefix = "_compacted_"
  private val StagingPrefix = "_staging_"

  /** Trigger policy, conf'd like the chess store's
    * (`StreamingImport.CompactEpochsConf`): compact once a store
    * accumulates this many live leaf partitions. Same reasoning, same
    * default — probe latency is flat in partition count on one node,
    * but file count (paid in listing RPCs and tasks by EVERY batch's
    * re-read) grows without bound; folding every ~8 batches keeps it a
    * small constant while amortizing the rewrite. */
  val CompactBatchesConf = "spark.graft.stream.compactBatches"
  val DefaultCompactBatches = 8

  /** Retry budget for [[snapshotRead]]'s optimistic resolve-scan-
    * validate loop, conf'd like the fold trigger above: each retry
    * requires ANOTHER compaction to have published mid-scan, so the
    * default only binds under pathological churn; an external reader
    * racing a deliberately hot compactor can raise it. */
  val SnapshotAttemptsConf = "spark.graft.stream.snapshotAttempts"
  val DefaultSnapshotAttempts = 5

  /** Highest published compaction frontier (0 = never compacted). One
    * FileSystem listing, no Spark job. */
  def frontier(dir: String): Long =
    graft.Fs.childNames(dir)
      .collect { case n if n.startsWith(MarkerPrefix) =>
        n.stripPrefix(MarkerPrefix).toLong }
      .maxOption.getOrElse(0L)

  private def liveCond(m: Long, upper: Option[Long]): Column = {
    val real = upper match {
      case Some(b) => col("batch_id") >= m && col("batch_id") < b
      case None    => col("batch_id") >= m
    }
    if (m > 0) real || col("batch_id") === -m else real
  }

  /** Rows visible to batch `batchId`: exactly the strictly-earlier
    * batches, however they are physically laid out (folded or not).
    * batch_id is the partition column, so the condition prunes
    * partition DIRECTORIES — a fold really does shrink the scan. */
  def earlier(spark: SparkSession, dir: String, batchId: Long): DataFrame =
    spark.read.parquet(dir).filter(liveCond(frontier(dir), Some(batchId)))

  /** All live rows — for batch-less readers (final summaries). */
  def liveRows(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).filter(liveCond(frontier(dir), None))

  /** Consistent snapshot read for an EXTERNAL reader — one not
    * serialized by the stream's own foreachBatch. Optimistic
    * resolve-scan-validate: pin the marker, run `f` over the live rows
    * under it, then re-read the marker — the attempt only counts if no
    * compaction PUBLISHED meanwhile. Both halves of the race are
    * covered: (a) a sweep deleting listed files mid-scan surfaces as a
    * missing-file failure → retry (`ignoreMissingFiles` would instead
    * silently DROP swept partitions whose rows now live only in the new
    * fold — data loss, not a snapshot); (b) the subtler torn-but-
    * successful read, where a scan under a STALE marker silently
    * excludes a newer fold its filter doesn't select — no error, wrong
    * answer — is caught by the marker validation. An unchanged marker
    * across the scan proves the listing, the filter and the files all
    * belonged to the same published frontier. Each retry requires
    * another compaction to have published mid-scan, so `maxAttempts`
    * only bounds pathological churn. */
  def snapshotRead[T](spark: SparkSession, dir: String,
      maxAttempts: Int = -1)(f: DataFrame => T): T = {
    val budget = if (maxAttempts > 0) maxAttempts
      else spark.conf.get(SnapshotAttemptsConf,
        DefaultSnapshotAttempts.toString).toInt
    var left = budget
    var out: Option[T] = None
    var torn = 0
    var swept = 0
    while (out.isEmpty) {
      require(left > 0,
        s"snapshot of $dir did not stabilize within $budget attempts " +
          s"($torn torn-frontier reads — marker advanced mid-scan — and " +
          s"$swept sweep-race scan failures; a compaction published " +
          s"during every read; raise $SnapshotAttemptsConf or pause " +
          "compaction for external readers)")
      left -= 1
      val m0 = frontier(dir)
      try {
        val v = f(spark.read.parquet(dir).filter(liveCond(m0, None)))
        if (frontier(dir) == m0) out = Some(v) else torn += 1
      } catch {
        case e: Throwable if left > 0 && causedByMissingFile(e) => swept += 1
      }
    }
    out.get
  }

  /** A scan failure rooted in a file deleted after listing — the sweep
    * race signature. Spark wraps the executor-side failure in
    * SparkException layers (sometimes only in message text after
    * serialization), and the wrapper's error class depends on WHERE in
    * the read the delete landed: a miss at open is
    * `FAILED_READ_FILE.FILE_NOT_EXIST` with a FileNotFoundException
    * cause, but a delete mid-read (footer fetched, column chunks gone)
    * surfaces as `FAILED_READ_FILE.NO_HINT` over an IOException. The
    * match is deliberately NARROW: only those two error-class suffixes
    * (NO_HINT additionally requiring an IOException somewhere in the
    * cause chain) or a FileNotFoundException itself count as the race —
    * a genuinely corrupt footer (`FAILED_READ_FILE.CANNOT_READ_FILE`,
    * parquet magic-byte errors, …) must fail on the FIRST attempt, not
    * burn the retry budget masquerading as the sweep. */
  private def causedByMissingFile(e: Throwable): Boolean = {
    def chain(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("")
    chain(e).exists { c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
      msg(c).contains("FileNotFoundException") ||
      msg(c).contains("FAILED_READ_FILE.FILE_NOT_EXIST") ||
      (msg(c).contains("FAILED_READ_FILE.NO_HINT") &&
        chain(e).exists(_.isInstanceOf[java.io.IOException]))
    }
  }

  /** Live leaf-partition count — the read-amplification figure (parquet
    * directories every per-batch re-read must list). */
  def livePartitionCount(dir: String): Int = {
    val m = frontier(dir)
    val ids = graft.Fs.childNames(dir).filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
    ids.count(_ >= m) + (if (m > 0 && ids.contains(-m)) 1 else 0)
  }

  /** Fold all live rows with `batch_id < frontierNew` into the single
    * partition `batch_id = -frontierNew`, publish, sweep. Crash-safe per
    * the object doc; idempotent — a re-run with the same frontier
    * rebuilds the same fold. No-op if nothing is below the frontier. */
  def compact(spark: SparkSession, dir: String, frontierNew: Long): Unit = {
    val m = frontier(dir)
    require(frontierNew > m,
      s"compaction frontier must advance (published $m, asked $frontierNew)")
    // stage the fold under an underscore dir (invisible to partition
    // discovery), so no reader — including this fold's own scan — can
    // ever see a half-written or torn file
    val staging = s"$dir/$StagingPrefix$frontierNew"
    spark.read.parquet(dir)
      .filter(liveCond(m, Some(frontierNew)))
      .drop("batch_id")
      .write.mode("overwrite").parquet(staging)
    // install: clear any partial target from a crashed attempt (part
    // file names are per-job UUIDs — a blind re-move would duplicate),
    // move the staged part files in, then publish via marker creation
    val target = s"$dir/batch_id=-$frontierNew"
    graft.Fs.delete(target)
    graft.Fs.mkdirs(target)
    graft.Fs.childNames(staging).filter(_.startsWith("part-"))
      .foreach(f => graft.Fs.rename(s"$staging/$f", s"$target/$f"))
    graft.Fs.delete(staging)
    graft.Fs.touch(s"$dir/$MarkerPrefix$frontierNew")
    sweep(dir)
  }

  /** Delete everything the current marker makes invisible: folded real
    * partitions below the frontier, superseded folds, old markers.
    * Safe to re-run any time (the next compaction re-sweeps after a
    * crashed one). */
  def sweep(dir: String): Unit = {
    val m = frontier(dir)
    if (m > 0) graft.Fs.childNames(dir).foreach { n =>
      if (n.startsWith("batch_id=")) {
        val id = n.stripPrefix("batch_id=").toLong
        if ((id >= 0 && id < m) || (id < 0 && id != -m))
          graft.Fs.delete(s"$dir/$n")
      } else if (n.startsWith(MarkerPrefix) &&
                 n.stripPrefix(MarkerPrefix).toLong < m)
        graft.Fs.delete(s"$dir/$n")
    }
  }

  /** Apply the trigger policy inside `processBatch(batchId)`, AFTER the
    * batch's own writes: compact iff the live partition count reached
    * the conf'd threshold. Returns whether compaction ran. */
  def maybeCompact(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val thr = spark.conf.get(CompactBatchesConf,
      DefaultCompactBatches.toString).toInt
    val due = batchId > frontier(dir) && livePartitionCount(dir) >= thr
    if (due) compact(spark, dir, batchId)
    due
  }
}
