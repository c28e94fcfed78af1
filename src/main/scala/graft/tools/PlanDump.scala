package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for declared queries to files — the
  * committed plan evidence for optimization rounds
  * (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <sfDir> <name>[,<name>...]
  *
  * Iterative queries run driver-side actions while BUILDING their frame;
  * the dump is the plan of the RETURNED frame (the shape the caller's
  * action executes), which is the comparable artifact across rounds.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <outDir> <suffix> <sfDir> <names,comma-sep>")
    val Array(outDir, suffix, sfDir) = args.take(3)
    val names = args(3).split(",").toSeq.filter(SparkEntry.queries.contains)
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), txt)
        println(s"PLANDUMP wrote $outDir/${n}_$suffix.txt")
      } catch {
        case e: Throwable => println(s"PLANDUMP FAILED $n: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
