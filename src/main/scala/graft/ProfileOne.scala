package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Ad-hoc per-job profiler (dev tool):
  * runMain graft.ProfileOne <name> [sfDir] [cpus]
  * Runs the named declared query once warm + once timed with a listener
  * that records every Spark job's wall time, task count, and the callsite
  * (so a 7 s lifecycle query decomposes into its store operations).
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .appName("graft-profile").master(s"local[$cpus]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class J(id: Int, var desc: String, var start: Long = 0L,
                 var end: Long = 0L, var tasks: Int = 0,
                 var shufRead: Long = 0L, var shufWrite: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val active = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (active.get) {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          jobs.synchronized {
            jobs(e.jobId) = J(e.jobId, d, e.time)
          }
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          // attribute tasks to the newest unfinished job (approximate)
          jobs.values.toSeq.filter(_.end == 0L).lastOption.foreach { j =>
            j.tasks += 1
            Option(e.taskMetrics).foreach { m =>
              j.shufRead += m.shuffleReadMetrics.totalBytesRead
              j.shufWrite += m.shuffleWriteMetrics.bytesWritten
            }
          }
        }
    })
    // warm-up pass (JIT, codegen cache, parquet footers)
    SparkEntry.queries(name)(spark, dir).count()
    // Sample the MAIN driver thread's stack during the timed pass: the
    // inter-job gaps are driver work (planning / manifest IO / commit
    // protocol) and this attributes them without a UI.
    val mainThread = Thread.currentThread()
    val samples = mutable.HashMap.empty[String, Int].withDefaultValue(0)
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(true)
    val sampler = new Thread(() => {
      while (sampling.get) {
        val st = mainThread.getStackTrace
        if (st.nonEmpty) {
          val tag =
            if (st.exists(_.getClassName.contains("DAGScheduler"))) "wait-on-job"
            else {
              // top 3 meaningful frames
              st.filterNot(f => f.getClassName.startsWith("java.lang.Thread"))
                .take(4).map(f =>
                  f.getClassName.split('.').takeRight(2).mkString(".") +
                    "." + f.getMethodName).mkString(" < ")
            }
          samples.synchronized { samples(tag) += 1 }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    active.set(true)
    sampler.start()
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling.set(false)
    active.set(false)
    Thread.sleep(300)
    println(f"[profile] $name rows=$n wall=$wall%.2f s jobs=${jobs.size}")
    val byDur = jobs.values.toSeq
    var cum = 0.0
    byDur.foreach { j =>
      val dur = (j.end - j.start) / 1e3
      cum += dur
      println(f"[job] ${j.id}%4d ${dur}%7.3f s  tasks=${j.tasks}%5d  " +
        f"sr=${j.shufRead / 1e6}%8.1f MB sw=${j.shufWrite / 1e6}%8.1f MB  ${j.desc}")
    }
    println(f"[profile] sum-of-jobs=${cum}%.2f s (gaps = driver time = ${wall - cum}%.2f s)")
    val tot = samples.values.sum.max(1)
    samples.toSeq.sortBy(-_._2).take(25).foreach { case (tag, c) =>
      println(f"[stack] ${c * 100.0 / tot}%5.1f%% ($c%4d) $tag")
    }
    spark.stop()
  }
}
