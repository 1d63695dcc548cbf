package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** The storage-native probe-pruning primitives shared by the persisted
  * indexes ([[MinhashIndex]], [[ContamIndex]]): every probe-keyed file is
  * written with bounded row groups, per-row-group parquet BLOOM filters
  * on the probe key, and key-sorted rows (row-group min/max); a probe
  * pushes its own key set as native `In` literals, which the blooms and
  * range stats turn into exact row-group skipping — a batch whose keys
  * are absent reads ~zero rows, one whose keys hit reads only the hit
  * row groups. Adjudicated in round 15 against a custom bitmap Bloom
  * sidecar (rejected by its own rows-axis instrument: min(m/64, k·n)
  * floor per probe — more than the table it guarded); the storage-native
  * design measured 38× fewer probe rows at the 20× drain.
  */
private[operators] object KeyProbe {

  /** Driver-side cap on key literals pushed as ONE `In`. Spark 4 pushes
    * `In` into parquet natively at any size (measured:
    * `PushedFilters: [In(band, [...])]` with 64k literals); the cap
    * bounds per-filter footer-eval cost and keeps each union branch's
    * expression tree sane.
    */
  private[operators] val MaxKeyLiterals = 65536

  /** Bound for CHUNKED literal probing: past [[MaxKeyLiterals]] a probe
    * slices its SORTED key set into ≤[[MaxKeyLiterals]] runs and unions
    * one bounded scan per slice ([[inSlices]]). Sorted slices are
    * contiguous key ranges, and index files are key-sorted within
    * partitions, so a row group's [min,max] intersects ~one slice — the
    * union reads hit row groups ONCE (plus range-boundary overlap), not
    * once per slice, and row groups holding none of the probed keys are
    * skipped exactly as under the cap. Past THIS bound (0.5M keys ≈
    * 16 MB of md5 strings on the driver) callers fall back to partition
    * pruning alone — a batch that large is a bulk rebuild's job.
    * `GRAFT_CHUNKED_PROBE=0` forces the pre-chunking fallback at
    * [[MaxKeyLiterals]] (measurement seam for rows-axis A/Bs in the
    * bench notes); it never changes answers, only pruning.
    */
  private[operators] val ChunkedKeyLiterals = 8 * MaxKeyLiterals

  private[operators] def chunkBound: Int =
    if (sys.env.get("GRAFT_CHUNKED_PROBE").contains("0")) MaxKeyLiterals
    else ChunkedKeyLiterals

  /** Minimum scanned-table size for the sliced-In escalation. The slices
    * trade a FIXED per-task cost (filter serialization — ~3 MB task
    * binaries per 64k-literal slice — plus per-row-group bloom/InSet
    * evaluation, paid once per slice branch) for an O(table) read term.
    * Measured at the 20× rehearsal (99k novel band literals vs a 13 MB /
    * 629k-row postings table): slicing read 4.1× fewer ROWS but 2× more
    * WALL — below this bound a partition-pruned full scan is simply
    * cheaper than the literal machinery, above it the skipped read
    * dominates (and at production sizes it is the only bounded choice).
    * 256 MB ≈ 20× the measured break-even's scale, chosen conservative:
    * the fallback is merely a small flat cost at sizes under the gate,
    * while a mis-gated full scan at production size is an O(corpus)
    * regression.
    */
  private[operators] val ChunkedScanMinBytes: Long = 256L << 20

  /** `df` filtered to `key ∈ lits`, pushed as one `In` per sorted
    * ≤[[MaxKeyLiterals]] slice (unioned — slices partition the literal
    * set, so no row matches twice). Callers pass `lits` SORTED.
    */
  private[operators] def inSlices(df: DataFrame, key: String,
                                  lits: Seq[Any]): DataFrame =
    if (lits.size <= MaxKeyLiterals) df.filter(col(key).isin(lits: _*))
    else lits.grouped(MaxKeyLiterals)
      .map(s => df.filter(col(key).isin(s: _*)))
      .reduce(_ union _)

  /** The probe-side literal filter, cost-gated: a single pushed `In` up
    * to [[MaxKeyLiterals]]; past it, sorted ≤64k slices — but only when
    * the scanned dir is at least [[ChunkedScanMinBytes]] (else the
    * partition-pruned full scan the caller already applied is cheaper,
    * see the gate's scaladoc). `GRAFT_CHUNKED_PROBE=force` bypasses the
    * size gate (measurement seam); an unreadable dir size errs toward
    * slicing (bounded reads beat a possibly-huge scan when in doubt).
    * Pruning only — never changes answers.
    */
  private[operators] def keyFiltered(df: DataFrame, key: String,
                                     lits: Seq[Any],
                                     scannedDir: => String): DataFrame =
    if (lits.size <= MaxKeyLiterals) df.filter(col(key).isin(lits: _*))
    else if (sys.env.get("GRAFT_CHUNKED_PROBE").contains("force") ||
        dirBytesAtLeast(df.sparkSession, scannedDir, ChunkedScanMinBytes))
      inSlices(df, key, lits)
    else df

  /** Whether a probe should even COLLECT literals for `dir`: true when
    * the dir is at least [[ChunkedScanMinBytes]] (or the force seam is
    * set). For keys whose cardinality scales with batch CONTENT rather
    * than batch rows — gram ids run O(batch tokens), hundreds of
    * thousands per small batch — the driver-side distinct+collect itself
    * costs multiples of a small table's whole scan (measured: +5.6 s on
    * a probe whose unpruned read was 1.4 s), so the size gate must run
    * BEFORE the collect, not just before the filter.
    */
  private[operators] def literalsWorthIt(
      spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    sys.env.get("GRAFT_CHUNKED_PROBE").contains("force") ||
      dirBytesAtLeast(spark, dir, ChunkedScanMinBytes)

  private def dirBytesAtLeast(spark: org.apache.spark.sql.SparkSession,
                              dir: String, bound: Long): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength >= bound
    } catch { case _: Throwable => true }

  /** Write options for key-probed parquet files: bounded row groups so
    * collision reads stay fine-grained, plus a per-row-group parquet
    * BLOOM on the probe key — the structure that lets a pushed `In` skip
    * every row group holding none of the probe's literals. Expected NDV
    * sized to the ~4 MB row group's row count (an undersized bloom
    * degrades to false positives only — extra reads, never wrong
    * answers). `GRAFT_KEYBLOOM=0` writes the same row-group geometry
    * WITHOUT the bloom (measurement seam: the paired build-overhead A/B
    * in the bench notes isolates the bloom-write cost alone; probes
    * against bloomless files are correct, just unpruned at the row-group
    * level).
    */
  private[operators] def withKeyBloom[T](
      w: org.apache.spark.sql.DataFrameWriter[T], key: String) = {
    val sized = w.option("parquet.block.size", (4 << 20).toString)
    if (sys.env.get("GRAFT_KEYBLOOM").contains("0")) sized
    else sized
      .option(s"parquet.bloom.filter.enabled#$key", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$key", "131072")
  }
}
