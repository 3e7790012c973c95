package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (sbt forks a single
  * test JVM; building a session per spec would dominate runtime). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      // same engine-default extensions as Verify/Bench, so every spec
      // exercises the native functions + optimizer rewrite path
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS): read nanos as long engine-wide
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's checksum checkpoint manager deadlocked the whole
      // suite under the streaming tests (all executor threads parked in
      // ChecksumCheckpointFileManager.awaitResult); tests don't need
      // checkpoint corruption detection.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // bucketed-table specs saveAsTable; keep the warehouse out of the
      // repo working tree
      .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Logging.quietNoise()
    s
  }
}
