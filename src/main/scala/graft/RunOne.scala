package graft

import org.apache.spark.sql.SparkSession

/** Run a single SparkEntry query by name: timing + optional explain.
  * Usage: RunOne <name> [sfDir] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // construction is timed separately: queries that train, write
    // catalog state, or eagerly checkpoint (q75/q96/q118-q122/q131) do
    // real work BEFORE the returned plan runs — Bench times fn+collect
    // together, so cold here = tc + t
    val tc0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    println(f"[runone] $name construct tc=${(System.nanoTime() - tc0) / 1e9}%.2f s")
    if (args.contains("explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[runone] $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val n2 = df.count()
    println(f"[runone] $name warm rows=$n2%d t=${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
