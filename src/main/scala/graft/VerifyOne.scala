package graft
import org.apache.spark.sql.SparkSession
/** Targeted correctness dump: like [[Verify]] but only for the named
  * queries — the fast iteration loop when ONE oracle is under repair
  * (full Verify replays all ~80 queries for a one-query check).
  *
  * The outDir is made self-consistent on every run (advice r8): stale
  * sibling dumps from a previous invocation with a different query list are
  * deleted, so check_oracle.py only ever sees dumps whose SQL is present in
  * the freshly written oracle_sql.json.
  *
  * Usage: runMain graft.VerifyOne <sfDir> <outDir> <query> [query ...]
  * then:  python3 tools/check_oracle.py <sfDir> <outDir>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifyOne <sfDir> <outDir> <q> [q ...]")
    val sfDir = args(0); val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new java.io.File(outDir)
    out.mkdirs()
    // Only reclaim directories that are recognizably prior dumps (named
    // after a declared query); unrelated content in a shared outDir is
    // left alone (advice r9).
    Option(out.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !names.contains(f.getName) &&
        SparkEntry.queries.contains(f.getName))
      .foreach(VerifyIO.deleteRec)
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    VerifyIO.writeOracleJson(outDir,
      SparkEntry.oracleSql.filter(kv => names.contains(kv._1)))
    spark.stop()
  }
}
