package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Execution helpers shared across operators. */
object Exec {

  /** Materialize a small, multiply-read intermediate into executor storage.
    *
    * persist(MEMORY_AND_DISK) + an eager count: downstream branches share one
    * computation (the reuse an eager localCheckpoint would provide) while the
    * lineage stays intact — an executor loss recomputes the lost partitions
    * from source instead of failing the job on a missing unreplicated
    * checkpoint block, which is the fault-tolerance story a 1000-executor run
    * needs. The tradeoff: the retained lineage can be recomputed, so a lost
    * block costs a partial re-run rather than nothing; for multi-hour
    * pipelines that want loss-proof cut points, write the intermediate to a
    * table instead. Callers are responsible for the frame being small
    * relative to its inputs (candidate sets, signatures, bounded vector
    * frames).
    */
  def materialize(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  /** Recursive local-path delete (model/state/sink swap dirs). */
  def deletePath(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val f = new java.io.File(path)
    if (f.exists()) rm(f)
  }
}
