package graft.tools

/** Host-level tuning defaults shared by the perf surfaces (Bench,
  * MicroBench). Everything here is an ENV-overridable default with a
  * safe fallback — never a hard-coded host assumption — per the
  * optimization-round rule that scale-dependent settings stay
  * parameterised (guide §9: "a sane baseline ... to be revisited with
  * measurements").
  */
object Tuning {

  /** Scratch directory for shuffle files and block-manager spill
    * (`spark.local.dir`). Default: a RAM-backed tmpfs (`/dev/shm`) when
    * one exists — on this class of host the benched shuffles are far
    * smaller than RAM, and tmpfs removes disk I/O and page-cache
    * writeback from every Exchange (guide §2.1: shuffle cost is
    * write + fetch; §9 assumes "fast local disks", which tmpfs
    * approximates exactly). Production clusters point this at real
    * NVMe arrays via SPARK_GRAFT_LOCAL_DIR or their own
    * spark.local.dir; the fallback is the JVM tmpdir Spark would have
    * used anyway. */
  def localDir: String =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft-spark-local")
        d.mkdirs()
        d.getAbsolutePath
      } else System.getProperty("java.io.tmpdir")
    }

  /** `spark.sql.join.preferSortMergeJoin` for the perf sessions
    * (SPARK_GRAFT_PREFER_SMJ). Default false (guide §3.1/§9): the
    * planner may pick shuffled-hash join when its size conditions hold —
    * no sort of either side; d25's wave join ran sort-bound under SMJ
    * (jstack-sampled r17, sort_addToSorter dominating the busy
    * samples). SMJ remains the fallback whenever the size conditions
    * fail, and spills guard the hash build. */
  def preferSortMergeJoin: String =
    sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false")

  /** Run `f` (a streaming query: plan + start + awaitTermination) with
    * `spark.sql.shuffle.partitions` capped at SPARK_GRAFT_STREAM_PARTITIONS
    * (default 8), restoring the session value afterwards.
    *
    * Why: stateful micro-batch queries pay O(partitions) PER BATCH in
    * state-store maintenance (each partition keeps an HDFS-backed store
    * with delta/snapshot files committed every batch) and task overhead,
    * AQE is disabled under streaming so nothing coalesces them, and the
    * benched state volumes are KBs — measured on this host, the
    * streaming gates ran 2–3× SLOWER at local[32] (32 state partitions)
    * than at local[8] (st10 9.7 s vs 4.6 s, st06 7.6 s vs 2.6 s,
    * BENCH_r17 before-run vs BENCH_r16_c8). Sizing state partitions to
    * STATE VOLUME rather than core count is the production rule too
    * (guide §2.2: fewer, larger partitions; state stores aren't
    * CPU-bound); a deployment with large keyed state raises the env
    * knob. Results are partition-count-independent (the determinism
    * sweep asserts layout independence for every gate). */
  def withStreamShuffle[A](spark: org.apache.spark.sql.SparkSession)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val cap = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8").toInt
    val eff = math.min(prev.toInt, cap)
    if (eff == prev.toInt) f
    else {
      spark.conf.set(key, eff.toString)
      try f finally spark.conf.set(key, prev)
    }
  }
}
