package graft

/** Session-bootstrap sizing for the local harness.
  *
  * History, because this setting has flipped on measurement twice:
  *
  *  - Round 8: q363's 1.2B-row candidate aggregation OOM'd a 48 GB
  *    heap at 32 shuffle partitions; hand-setting 256 partitions plus
  *    an 80 GB heap completed it, and round 9 automated BOTH (width
  *    from input bytes here, heap from the SF dir in
  *    `tools/run_bench.sh`).
  *  - Round 10's paired same-host protocol separated the two factors:
  *    with the 80 GB heap in place, the data-scaled WIDTH is a pure
  *    penalty on this box. Isolated sf10 probes (fresh JVM each):
  *    q408 10.4 s at 32 partitions vs 56.8 s at 256 vs 83.5 s at
  *    1024; q363 900 s at 32 vs 964 s at 256; q368 confirms the same
  *    direction. Event logs show why: the big aggregation spills
  *    ~110-130 GB regardless of width (execution memory is shared by
  *    the same 32 worker threads, so per-task width slicing does not
  *    change the total in-flight state), while every extra partition
  *    adds scheduling + shuffle-segment overhead to ALL stages. The
  *    r8 OOM was the heap's fault, not the width's.
  *
  * So: shuffle width = cores (the cluster analog local[32] is meant
  * to model — on a real cluster you size partitions to ~2-3x total
  * cores and let AQE coalesce), and the heap scales with the input
  * (`run_bench.sh`). `SPARK_GRAFT_SHUFFLE` still overrides for
  * experiments; the probes above are reproducible with it.
  */
object Tuning {
  /** Recursive on-disk size of a data directory (bytes). Kept for
    * callers that size OTHER knobs from the input (heap tiers, spill
    * thresholds in tools).
    */
  def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(dir))
  }

  /** Shuffle partition count: the core count (see object doc for the
    * round-10 measurement that reverted the round-9 data-scaling).
    */
  def shufflePartitions(sfDir: String, cpus: Int): Int = cpus

  /** The env-overridable form both harness mains use. */
  def shuffleConf(sfDir: String, cpus: Int): String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      String.valueOf(shufflePartitions(sfDir, cpus)))
}
