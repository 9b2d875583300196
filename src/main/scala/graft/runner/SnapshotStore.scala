package graft.runner

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The staging/marker contract every resumable stage goes through
  * (north_rule: "resumable from Iceberg snapshot checkpoints").
  *
  * A store is bound to one ROOT (a directory for the parquet binding, a
  * table prefix for a catalog binding) and promises:
  *  - [[stage]] publishes a named frame ATOMICALLY-ENOUGH: a stage is
  *    either completely published (and [[isDone]] is true) or invisible —
  *    readers never observe a half-written stage;
  *  - a completed stage is never recomputed: `stage` re-entered after a
  *    crash returns the published data and skips `compute`;
  *  - [[readMeta]]/[[writeMeta]] hold small run-metadata blobs (the dedup
  *    config seal) with the same publish-once visibility.
  *
  * Bindings:
  *  - [[SnapshotStore.parquetMarkers]] (default, this sandbox): parquet
  *    directory + `_GRAFT_DONE` marker file; meta = one file per key.
  *  - Iceberg (production, jars not present here): `stage` ⇒ a snapshot
  *    commit on `<prefix>_<name>` (`df.writeTo(t).createOrReplace()`),
  *    `isDone` ⇒ the table's current snapshot carries the stage tag,
  *    meta ⇒ table properties. The swap is this trait — no orchestration
  *    code changes.
  */
trait SnapshotStore {
  def isDone(name: String): Boolean

  /** Run `compute` and publish it under `name`, unless a completed
    * snapshot already exists — then read it back instead (resume). Readers
    * downstream get a materialized frame either way, so a re-run after
    * failure never recomputes finished stages.
    */
  def stage(name: String)(compute: => DataFrame): DataFrame

  def readMeta(key: String): Option[String]
  def writeMeta(key: String, value: String): Unit
}

object SnapshotStore {

  /** Binding factory: (session, root) → store. Orchestration code takes
    * one of these (defaulting to [[parquetMarkers]]) so the production
    * Iceberg binding is a parameter, not a rewrite.
    */
  type Binding = (SparkSession, String) => SnapshotStore

  private val Marker = "_GRAFT_DONE"

  /** Default binding: staged parquet + completion marker (≈ the
    * reference's per-batch volatile tables + final publish,
    * GQ:665-676,770-787).
    */
  val parquetMarkers: Binding = (spark, root) => new SnapshotStore {
    private def fs(p: Path) =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def isDone(name: String): Boolean = {
      val p = new Path(s"$root/$name/$Marker")
      fs(p).exists(p)
    }

    def stage(name: String)(compute: => DataFrame): DataFrame = {
      val path = s"$root/$name"
      if (!isDone(name)) {
        compute.write.mode("overwrite").parquet(path)
        fs(new Path(path)).create(new Path(s"$path/$Marker"), true).close()
      }
      spark.read.parquet(path)
    }

    def readMeta(key: String): Option[String] = {
      val p = new Path(s"$root/_GRAFT_$key")
      val f = fs(p)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim)
        finally in.close()
      }
    }

    def writeMeta(key: String, value: String): Unit = {
      val p = new Path(s"$root/_GRAFT_$key")
      val out = fs(p).create(p, true)
      try out.write((value + "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }
}
