package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once parquet store for deterministic trained artifacts (IVF coarse
  * centroids, PQ codebooks). Production ANN systems separate training from
  * search — train is a job, its artifact persists, every search/measurement
  * consumes the persisted copy (same posture as [[Similarity.buildIvfIndex]]
  * vs [[Similarity.searchIvfIndex]]). This store gives callers that posture
  * for the k-row artifact frames: the first request for a key runs the
  * builder and writes the result to parquet; every later request reads the
  * parquet back.
  *
  * Both trainers are exact fixed-point and deterministic, and floats
  * round-trip parquet bit-exactly, so a consumer cannot distinguish a
  * cached artifact from a fresh training run — outputs hash identically.
  *
  * The store is scoped to the JVM (a fresh temp dir per process, wiped on
  * exit): no staleness across code versions, no cross-process coordination.
  * A cluster deployment would point `root` at shared storage instead.
  */
object TrainedStore {
  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-trained-")
    sys.addShutdownHook {
      // best-effort sweep; temp-dir GC covers anything left behind
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }
    p
  }
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]
  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]

  /** The parquet-backed artifact for `key` (a caller-chosen name that must
    * capture everything the builder's output depends on — corpus path and
    * training parameters). Builds at most once per JVM: the build runs under
    * a per-key lock (TrieMap.getOrElseUpdate alone evaluates the by-name
    * builder non-atomically under races, and a double `overwrite` write to
    * one path can interleave). The path carries a hash of the RAW key so two
    * distinct keys that sanitize to the same readable prefix cannot collide
    * onto one artifact.
    */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val safe = safeName(key)
    val path = root.resolve(safe).toString
    // putIfAbsent (not getOrElseUpdate) so every racer observes ONE winner
    locks.putIfAbsent(safe, new Object)
    locks(safe).synchronized {
      if (!built.contains(safe)) {
        build.write.mode("overwrite").parquet(path)
        built.put(safe, ())
      }
    }
    spark.read.parquet(path)
  }

  /** Multi-part artifact under one key and one build: `build` receives a
    * writer that persists a named part and hands back the READ-BACK frame,
    * so later parts derive from persisted predecessors instead of
    * recomputing the shared upstream pass (the containment index's three
    * parts all hang off one corpus shingle scan). Same per-key lock and
    * build-at-most-once-per-JVM semantics as [[cached]].
    */
  def cachedMulti(spark: SparkSession, key: String)(
      build: ((String, DataFrame) => DataFrame) => Unit): Map[String, DataFrame] = {
    val safe = safeName(key)
    val dir = root.resolve(safe)
    locks.putIfAbsent(safe, new Object)
    locks(safe).synchronized {
      if (!built.contains(safe)) {
        build { (part, df) =>
          require(part.matches("[A-Za-z0-9._-]+"), s"part name: $part")
          val p = dir.resolve(part).toString
          df.write.mode("overwrite").parquet(p)
          spark.read.parquet(p)
        }
        built.put(safe, ())
      }
    }
    Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(f => f.getName -> spark.read.parquet(f.toString)).toMap
  }

  private def safeName(key: String): String =
    key.replaceAll("[^A-Za-z0-9._-]", "_") + "-" +
      java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(key))

  private val onceBuilt =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** Once-per-JVM side-effecting builds guarded by a SCOPE value (the
    * corpus dir for the `*_incremental` oracle queries' generation-swap
    * index builds): the first call for `key` runs `build` and records
    * (scope, value); later calls with the SAME scope return the recorded
    * value without building, and a DIFFERENT scope re-runs the build (the
    * warmup-at-sf0.001-then-bench-at-sf0.1 sequence — the live generation
    * must always match the corpus being probed). Same per-key locking as
    * [[cached]]; builds for different keys never serialize each other.
    */
  def builtOnce(key: String, scope: String)(build: => String): String = {
    val lockKey = "once:" + key
    locks.putIfAbsent(lockKey, new Object)
    locks(lockKey).synchronized {
      onceBuilt.get(key) match {
        case Some((`scope`, v)) => v
        case _ =>
          val v = build
          onceBuilt.put(key, (scope, v))
          v
      }
    }
  }
}
