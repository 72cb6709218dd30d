package graft.core

/** One-off measurement harness for the wide-CDC-window cost (round-9
  * verdict ask 4): builds an N-commit append-only table, then times
  *  (a) the BATCHED feed — one `changes(0, N)` call (insert-only commits
  *      collapse into one scan per schema era), vs
  *  (b) the per-commit shape the feed had before — a union of N
  *      single-commit `changes(v-1, v)` calls (one DataSource resolution
  *      and one union branch per commit).
  * Run: sbt "Test/runMain graft.core.ChangesWideProbe [nCommits]"
  */
object ChangesWideProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val spark = graft.core.Session.local()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wide_probe").toString
    (1 to n).foreach(i => TableLog.append(spark, dir,
      Seq((i.toLong, i * 2L)).toDF("id", "v").coalesce(1)))
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // batched (current)
    val (dfB, planB) = timed(TableLog.changes(spark, dir, 0, n.toLong, Seq("id")))
    val (cntB, execB) = timed(dfB.count())
    val leavesB = dfB.queryExecution.logical.collectLeaves().size
    // per-commit (former shape)
    val (dfP, planP) = timed(
      (1 to n).map(v => TableLog.changes(spark, dir, v - 1L, v.toLong, Seq("id")))
        .reduce(_.unionByName(_)))
    val (cntP, execP) = timed(dfP.count())
    val leavesP = dfP.queryExecution.logical.collectLeaves().size
    println(f"""{"commits": $n, "batched": {"plan_s": $planB%.2f, "exec_s": $execB%.2f, "leaves": $leavesB, "rows": $cntB}, "per_commit": {"plan_s": $planP%.2f, "exec_s": $execP%.2f, "leaves": $leavesP, "rows": $cntP}}""")
    spark.stop()
  }
}
