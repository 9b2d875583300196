package graft.runner

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Static sugar over the default [[SnapshotStore.parquetMarkers]] binding —
  * resumable stage checkpointing ≈ the reference's per-batch volatile
  * tables + final publish (GQ:665-676,770-787), recast as staged parquet
  * with an explicit completion marker. At production scale this is an
  * Iceberg snapshot commit (north_rule: "resumable from Iceberg snapshot
  * checkpoints") — the [[SnapshotStore]] trait is the swap point; the
  * marker-file protocol is the same shape: a stage is either fully
  * published or invisible.
  */
object Checkpoint {

  def isDone(spark: SparkSession, dir: String, name: String): Boolean =
    SnapshotStore.parquetMarkers(spark, dir).isDone(name)

  /** See [[SnapshotStore.stage]]. */
  def stage(spark: SparkSession, dir: String, name: String)
      (compute: => DataFrame): DataFrame =
    SnapshotStore.parquetMarkers(spark, dir).stage(name)(compute)

  def clear(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
