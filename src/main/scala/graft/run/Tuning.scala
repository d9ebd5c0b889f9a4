package graft.run

/** Data-derived session sizing.
  *
  * AQE's `initialPartitionNum` must track DATA, not core count: the
  * melt-heavy pipelines expand compressed parquet 30-50x into shuffle
  * state, and a constant width that fits one scale factor starves the
  * next (measured: 256 partitions fit <=30x the sf0.1 corpus on a 12g
  * heap; the 90x entity pipeline needed 1024 or it died with
  * AGGREGATE_OUT_OF_MEMORY). A real cluster derives width from executor
  * count; a local harness must derive it from input size. One initial
  * partition per MB of compressed input covers both measured points
  * (sf0.1 ~= 17 MB -> floor 256; 90x ~= 1.5 GB -> ~1530 >= the 1024
  * that was needed), and AQE coalesces the small stages back down so
  * over-width costs nothing but scheduler overhead.
  */
object Tuning {

  /** Total bytes under a testdata directory (flat parquet files). */
  def inputBytes(sfDir: String): Long = {
    def size(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(size).sum).getOrElse(0L)
      else f.length()
    size(new java.io.File(sfDir))
  }

  /** ~1 initial shuffle partition per MB of compressed input, clamped
    * to [floor, cap]. Env `SPARK_GRAFT_INIT_PARTITIONS` still overrides
    * for experiments. */
  def initialPartitions(sfDir: String, floor: Int = 256, cap: Int = 16384): Int =
    // flatMap(toIntOption): a malformed override falls back to the
    // derivation instead of crashing session construction.
    sys.env.get("SPARK_GRAFT_INIT_PARTITIONS").flatMap(_.toIntOption).getOrElse {
      math.min(cap.toLong, math.max(floor.toLong, inputBytes(sfDir) >> 20)).toInt
    }
}
