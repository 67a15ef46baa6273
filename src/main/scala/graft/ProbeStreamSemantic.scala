package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe (r13): per-STAGE task-skew report for the streaming semantic
  * admission gate — the aspect-level max-task number ProbeSkew reports
  * says "there is a tail", this says WHERE. Prints every stage over a
  * wall threshold with its task count, max single task, and total task
  * time, so a hot stage (one straggler = one serialized key family) is
  * attributable to a specific exchange in the micro-batch plan.
  *
  * Usage: tools/run.sh graft.ProbeStreamSemantic <sfDir> [queryName]
  */
object ProbeStreamSemantic {
  private final class StageSkewListener extends SparkListener {
    case class Agg(var n: Int = 0, var maxMs: Long = 0L, var sumMs: Long = 0L)
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (e.taskInfo != null) {
      val a = byStage.computeIfAbsent(e.stageId, _ => Agg())
      a.synchronized {
        a.n += 1; a.sumMs += e.taskInfo.duration
        a.maxMs = math.max(a.maxMs, e.taskInfo.duration)
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      names.put(e.stageInfo.stageId,
        e.stageInfo.name.linesIterator.next().take(120))
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = if (args.length > 1) args(1) else "q_stream_semantic_rejects"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        Scratch.localCheckpointFileManager)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new StageSkewListener
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val out = SparkEntry.queries(name)(spark, dir)
    val n = out.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // listener bus drains async
    println(f"[stage-skew] $name: $n rows, wall $wall%.2f s")
    val stages = l.byStage.entrySet().iterator()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    while (stages.hasNext) {
      val e = stages.next()
      rows += ((e.getKey, e.getValue.n, e.getValue.maxMs, e.getValue.sumMs))
    }
    rows.sortBy(-_._3).take(12).foreach { case (sid, n2, mx, sum) =>
      println(f"[stage-skew] stage $sid%5d tasks $n2%4d max ${mx / 1000.0}%7.2f s " +
        f"sum ${sum / 1000.0}%8.2f s  ${l.names.getOrDefault(sid, "?")}")
    }
    spark.stop()
  }
}
