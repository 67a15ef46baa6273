package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe (r14): per-stage attribution for ONE registry query under the
  * EXACT bench methodology — same session confs as [[Bench]] (including
  * `spark.graft.pairPresentationSort=false`), same timing action
  * ([[ProbeMaterialize.checksum]]), two runs with the listener counting
  * only the second (steady-state) run. Where [[ProbeStreamSemantic]]
  * answers "where is the skew" for a streaming gate under `count()`, this
  * answers "where do the benched seconds go" for any query: stages sorted
  * by TOTAL task time with per-stage max-task, so both serialized
  * stragglers and genuinely expensive parallel stages surface.
  *
  * Usage: tools/run.sh graft.ProbeQueryStages <queryName> [sfDir]
  */
object ProbeQueryStages {
  private final class StageAgg extends SparkListener {
    case class Agg(var n: Int = 0, var maxMs: Long = 0L, var sumMs: Long = 0L)
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile var enabled = false
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (enabled && e.taskInfo != null) {
        val a = byStage.computeIfAbsent(e.stageId, _ => Agg())
        a.synchronized {
          a.n += 1; a.sumMs += e.taskInfo.duration
          a.maxMs = math.max(a.maxMs, e.taskInfo.duration)
        }
      }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      if (enabled) {
        // the callsite NAME is usually an anonymous AQE future — the first
        // graft frame in `details` is the attribution that matters (r15)
        val site = e.stageInfo.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("ProbeQueryStages")
            && !l.contains("ProbeMaterialize"))
          .map(_.trim.stripPrefix("at ")).getOrElse("")
        names.put(e.stageInfo.stageId,
          (e.stageInfo.name.linesIterator.next().take(60) + "  " + site).take(180))
      }
    // per-JOB wall spans: sequential jobs (localCheckpoint, isEmpty
    // convergence checks, broadcasts) each pay scheduling+planning wall
    // that task time never shows; the gaps between jobs are pure
    // driver-side work (Catalyst, commit, collect)
    case class J(var t0: Long = 0L, var t1: Long = 0L, var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
      val j = jobs.computeIfAbsent(e.jobId, _ => J())
      j.t0 = e.time
      j.desc = e.stageInfos.map(_.name.linesIterator.next()).distinct
        .mkString(" | ").take(160)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = if (enabled) {
      val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation",
        Scratch.streamingCheckpointBase())
      .config("spark.sql.streaming.checkpointFileManagerClass",
        Scratch.localCheckpointFileManager)
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "10s")
      .config("spark.graft.pairPresentationSort", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.preflight(spark, sfDir)
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val l = new StageAgg
    spark.sparkContext.addSparkListener(l)
    var lastDf: org.apache.spark.sql.DataFrame = null
    def once(): Double = {
      val t0 = System.nanoTime()
      lastDf = ProbeMaterialize.wrap(SparkEntry.queries(name)(spark, sfDir))
      // collect(), not head(): head re-plans through a fresh limit(1)
      // QueryExecution, leaving lastDf's own executedPlan (the one the
      // metric walk reads) unexecuted. The frame is a 1-row aggregate.
      lastDf.collect()
      (System.nanoTime() - t0) / 1e9
    }
    val t1 = once()
    l.enabled = true // attribute the steady-state run only
    val t2 = once()
    l.enabled = false
    // GRAFT_PROBE_PLAN=1: walk the executed plan with its populated SQL
    // metrics — attributes seconds to OPERATORS where the stage listing
    // only attributes to anonymous AQE futures (r15). Prints nodes whose
    // own time-like metric exceeds 200 ms, with output rows.
    if (sys.env.contains("GRAFT_PROBE_PLAN") && lastDf != null) {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def walk(p: SparkPlan, depth: Int): Unit = {
        val ms = p.metrics.view.mapValues(_.value).toMap
        val t = ms.collect { case (k, v)
          if k.toLowerCase.contains("time") || k == "duration" => v }
          .foldLeft(0L)(math.max)
        val rows = ms.getOrElse("numOutputRows", -1L)
        if (t >= 200)
          println(f"[plan-metrics] ${"  " * depth}${p.nodeName}%-40s " +
            f"maxTimeMetric ${t / 1000.0}%8.2f s rows $rows%10d  " +
            ms.filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.take(6).mkString(" "))
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        kids.foreach(walk(_, depth + 1))
      }
      walk(lastDf.queryExecution.executedPlan, 0)
    }
    Thread.sleep(1500) // listener bus drains async
    println(f"[query-stages] $name: runs $t1%.2f / $t2%.2f s at $sfDir")
    val it = l.byStage.entrySet().iterator()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    while (it.hasNext) {
      val e = it.next()
      rows += ((e.getKey, e.getValue.n, e.getValue.maxMs, e.getValue.sumMs))
    }
    val totalTask = rows.map(_._4).sum / 1000.0
    println(f"[query-stages] total task time $totalTask%.2f s across ${rows.size} stages")
    rows.sortBy(-_._4).take(18).foreach { case (sid, n2, mx, sum) =>
      println(f"[query-stages] stage $sid%5d tasks $n2%4d max ${mx / 1000.0}%7.2f s " +
        f"sum ${sum / 1000.0}%8.2f s  ${l.names.getOrDefault(sid, "?")}")
    }
    val jit = l.jobs.entrySet().iterator()
    val jrows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    while (jit.hasNext) {
      val e = jit.next()
      jrows += ((e.getKey, e.getValue.t0, e.getValue.t1, e.getValue.desc))
    }
    val sortedJ = jrows.sortBy(_._2)
    val jobWall = sortedJ.collect { case (_, t0, t1, _) if t1 > 0 => t1 - t0 }.sum / 1000.0
    // occupancy = union of job intervals (jobs overlap: broadcast
    // exchanges run as concurrent futures); wall − occupancy = time with
    // NO job running at all — pure driver work (planning, commit)
    val ivs = sortedJ.collect { case (_, t0, t1, _) if t1 > 0 => (t0, t1) }
    var occ = 0L; var curS = 0L; var curE = -1L
    ivs.foreach { case (s0, e0) =>
      if (e0 > curE) {
        if (s0 > curE) { occ += (curE - curS).max(0L); curS = s0 }
        curE = e0
      }
    }
    occ += (curE - curS).max(0L)
    println(f"[query-jobs] ${sortedJ.size} jobs, job wall $jobWall%.2f s, " +
      f"occupancy ${occ / 1000.0}%.2f s (wall minus this = pure driver)")
    sortedJ.foreach { case (jid, t0, t1, desc) =>
      val w = if (t1 > 0) (t1 - t0) / 1000.0 else -1.0
      println(f"[query-jobs] job $jid%4d wall $w%7.3f s  $desc")
    }
    spark.stop()
  }
}
