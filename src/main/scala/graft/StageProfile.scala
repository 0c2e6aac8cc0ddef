package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage task-metric profiler (r22, verdict task 7): the tight-plan
  * NDS-H residue's static plans are already minimal, so the next lever
  * must come from MEASURED stage costs, not plan shapes. Runs each named
  * query warm (2 warmups, then one profiled run) and prints, per stage
  * of the profiled run: wall, summed executor run/GC time, shuffle
  * read/write bytes and records, input bytes, spill, and task count —
  * the §7.1 stage-page columns, machine-readable.
  *
  * Usage: runMain graft.StageProfile <sfDir> <q1,q2,...>
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq("ndsh_q11"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(id: Int, name: String, wallMs: Long, runMs: Long,
        gcMs: Long, srBytes: Long, srRows: Long, swBytes: Long, swRows: Long,
        inBytes: Long, spill: Long, tasks: Int)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    var record = false
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = e.stageInfo
          val m = i.taskMetrics
          stages.append(St(i.stageId,
            i.name.takeWhile(_ != '\n').take(60),
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            m.executorRunTime, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.recordsWritten,
            m.inputMetrics.bytesRead,
            m.memoryBytesSpilled + m.diskBytesSpilled,
            i.numTasks))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(); run() // warm
      spark.catalog.clearCache(); System.gc()
      stages.clear()
      record = true
      val wall = run()
      record = false
      // listener events drain asynchronously (private bus — settle instead)
      Thread.sleep(500)
      println(f"\n===== $name wall=$wall%.3fs stages=${stages.size} =====")
      println(f"${"stage"}%-6s${"wall_ms"}%8s${"run_ms"}%8s${"gc_ms"}%6s" +
        f"${"sh_read"}%10s${"r_rows"}%9s${"sh_write"}%10s${"w_rows"}%9s" +
        f"${"input"}%10s${"spill"}%7s${"tasks"}%6s  name")
      stages.sortBy(_.id).foreach { s =>
        println(f"${s.id}%-6d${s.wallMs}%8d${s.runMs}%8d${s.gcMs}%6d" +
          f"${s.srBytes}%10d${s.srRows}%9d${s.swBytes}%10d${s.swRows}%9d" +
          f"${s.inBytes}%10d${s.spill}%7d${s.tasks}%6d  ${s.name}")
      }
      val sumWall = stages.map(_.wallMs).sum
      println(f"stage wall sum=${sumWall}ms vs query wall=${(wall * 1000).toLong}ms " +
        f"(gap = driver/planning/job-submit floor)")
    }
    spark.stop()
  }
}
