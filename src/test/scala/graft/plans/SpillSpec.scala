package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry, SpillProbe}

/** Spill-path proof (VERDICT r9 task 4): the bench's heaviest shapes,
  * run under real memory pressure (forked JVM — tiny memory fraction,
  * two shuffle partitions, no broadcast, force-spill thresholds), must
  * (a) COMPLETE, (b) actually SPILL (nonzero diskBytesSpilled — every
  * graded bench so far recorded 0, so the spill-and-merge path was
  * never exercised), and (c) return content-identical results to the
  * unconstrained shared session. This is the test-scale stand-in for
  * the 100 TB claim that plans degrade to disk instead of OOMing, and
  * that the degraded path computes the same answer. */
class SpillSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("heavy shapes complete under forced spill with identical results") {
    // baseline hashes from the unconstrained shared session
    val byName = SparkEntry.allQueries.map(q => q.name -> q).toMap
    val baseline = SpillProbe.probeQueries.map { name =>
      name -> SpillProbe.contentHash(byName(name).run(spark, dir))
    }.toMap

    // fork the constrained probe JVM: context-level memory settings
    // can't be changed on the live shared session
    val out = java.nio.file.Files.createTempFile("graft_spill", ".tsv")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.SpillProbe", out.toString, dir)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val log = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    val code = proc.waitFor()
    assert(code == 0, s"spill probe exited $code; tail:\n${log.takeRight(2000)}")

    val lines = scala.io.Source.fromFile(out.toFile).getLines().toSeq
    val kv = lines.map(_.split('\t')).map(a => a(0) -> a.drop(1).toSeq).toMap
    val spillBytes = kv("spill_bytes").head.toLong
    assert(spillBytes > 0L,
      "the constrained run recorded ZERO spill — the pressure path was not exercised")
    SpillProbe.probeQueries.foreach { name =>
      val Seq(n, h) = kv(name)
      assert((n.toLong, h) == baseline(name),
        s"$name under forced spill diverged: got ($n,$h), want ${baseline(name)}")
    }
    info(f"spilled ${spillBytes / 1e6}%.1f MB across ${SpillProbe.probeQueries.size} queries")
  }
}
