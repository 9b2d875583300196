package graft.runner

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Resumable stage checkpointing ≈ the reference's per-batch volatile
  * tables + final publish (GQ:665-676,770-787), recast as staged parquet
  * with an explicit completion marker. At production scale this is an
  * Iceberg snapshot commit (north_rule: "resumable from Iceberg snapshot
  * checkpoints"); the marker-file protocol is the same shape: a stage is
  * either fully published or invisible.
  */
object Checkpoint {

  private val Marker = "_GRAFT_DONE"

  def isDone(spark: SparkSession, dir: String, name: String): Boolean = {
    val p = new Path(s"$dir/$name/$Marker")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Run `compute` and publish it under `dir/name`, unless a completed
    * checkpoint already exists — then read it back instead (resume).
    * Readers downstream get a materialized frame either way, so a re-run
    * after failure never recomputes finished stages.
    */
  def stage(spark: SparkSession, dir: String, name: String)
      (compute: => DataFrame): DataFrame = {
    val path = s"$dir/$name"
    if (!isDone(spark, dir, name)) {
      compute.write.mode("overwrite").parquet(path)
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new Path(s"$path/$Marker"), true).close()
    }
    spark.read.parquet(path)
  }

  def clear(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
