package graft

/** Session-bootstrap sizing derived from the INPUT, not the host.
  *
  * Shuffle width must scale with data volume: at sf10 a 1.2B-row
  * aggregate through 32 (= cores) partitions builds ~37M-entry
  * per-task hash maps and OOMs a 48g heap, while 256 partitions
  * stream it in bounded memory (round-8 measurement, SCALE.md). On a
  * real cluster AQE + `spark.sql.adaptive.coalescePartitions` do this
  * from runtime statistics; a local[N] harness has no cluster-sized
  * default, so derive it from the bytes on disk — the same signal a
  * capacity planner uses. `SPARK_GRAFT_SHUFFLE` always overrides.
  */
object Tuning {
  /** Recursive on-disk size of a data directory (bytes). */
  def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(dir))
  }

  /** Input-scaled shuffle partition count: one partition per ~8 MB of
    * compressed input (parquet expands ~5-10x into shuffle rows, so
    * this keeps per-task state tens-of-MB), never below the core count
    * (full parallelism on small inputs — and identical to the historic
    * `partitions = cores` default for every SF up to sf1, keeping
    * bench anchors comparable), rounded up to a power of two, capped
    * at 2048 (past that, per-partition scheduling overhead dominates a
    * single JVM). AQE coalesces the excess at runtime when a stage is
    * smaller than the input suggests.
    */
  def shufflePartitions(sfDir: String, cpus: Int): Int = {
    val bytes = try dirBytes(sfDir) catch { case _: Throwable => 0L }
    val fromData = (bytes / (8L << 20)) + 1
    var p = 1
    while (p < fromData && p < 2048) p *= 2
    math.max(cpus, p)
  }

  /** The env-overridable form both harness mains use. */
  def shuffleConf(sfDir: String, cpus: Int): String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      String.valueOf(shufflePartitions(sfDir, cpus)))
}
