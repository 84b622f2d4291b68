package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test/fork := true → one JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Tables.mkSession("local[4]", "4")
    s.sparkContext.setLogLevel("WARN")
    // a local-backed FileSystem under a NON-`file` scheme (r20): lets the
    // specs drive the store layer's non-local code paths — rename-as-
    // commit publishes, no OS file lock — without an HDFS cluster.
    // Registered before any Store call so the cloned session conf
    // carries the mapping.
    s.sparkContext.hadoopConfiguration.set("fs.testdfs.impl",
      "graft.TestDfs")
    s
  }
  val SF = "/root/testdata/sf0.001"
}

/** HDFS-stand-in FileSystem for the non-local publish-protocol specs:
  * RawLocalFileSystem's behavior (no checksum files) under the scheme
  * `testdfs`, so [[graft.sources.Store.isLocal]] reports NON-local and
  * every scheme-gated branch — [[graft.sources.Sinks.publishAtomic]]'s
  * rename-as-commit path, the debris marker re-check — executes for
  * real against a filesystem whose rename does NOT replace an existing
  * destination (Hadoop local rename nests into an existing dir, which
  * [[graft.sources.Store.renameNoReplace]] detects as a loss — the same
  * observable contract as HDFS's rename-fails-on-existing). */
class TestDfs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "testdfs"
  override def getUri: java.net.URI = java.net.URI.create("testdfs:///")
}
