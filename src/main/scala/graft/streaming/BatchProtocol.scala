package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The exactly-once micro-batch sink protocol shared by [[DocStream]] and
  * [[EmbedStream]] — ONE implementation of the safety-critical pieces
  * (commit markers, epoch listing, checkpoint-block release) so the two
  * streams cannot drift on crash semantics.
  *
  * Markers live on the SAME filesystem as the data, through the Hadoop
  * FileSystem API resolved from the index path: a driver-local
  * `java.nio.file` marker would silently break exactly-once for any
  * `s3a://`/`hdfs://` index or after a driver failover — the marker
  * would be written and checked on whichever machine happens to run the
  * batch while the data lands remotely.
  */
private[streaming] object BatchProtocol {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def markerPath(indexPath: String, batchId: Long) =
    new Path(s"$indexPath/_commits/$batchId")

  /** Has `batchId` fully committed (both sinks written)? */
  def committed(spark: SparkSession, indexPath: String, batchId: Long): Boolean =
    fs(spark, indexPath).exists(markerPath(indexPath, batchId))

  /** Write the commit marker — the LAST step of a batch. */
  def commit(spark: SparkSession, indexPath: String, batchId: Long): Unit = {
    val f = fs(spark, indexPath)
    f.mkdirs(new Path(s"$indexPath/_commits"))
    f.create(markerPath(indexPath, batchId), true).close()
  }

  /** The `batch_id=N` epoch ids present under the index directory. */
  def epochIds(spark: SparkSession, indexPath: String): Seq[Long] = {
    val f = fs(spark, indexPath)
    val root = new Path(indexPath)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
  }

  /** Migration precondition: every stream epoch (id ≥ 0) must be
    * committed. Migrating an uncommitted epoch folds a crashed batch's
    * sketches into the new index without its marker — on redelivery the
    * batch would find itself in the index and emit nothing, the silent
    * loss the marker protocol exists to prevent. A hard error here turns
    * that into an operator instruction: resume the stream to completion
    * first.
    */
  def requireQuiesced(spark: SparkSession, indexPath: String): Unit = {
    val missing = epochIds(spark, indexPath)
      .filter(id => id >= 0 && !committed(spark, indexPath, id))
    require(missing.isEmpty,
      s"index $indexPath has uncommitted epochs ${missing.sorted.mkString(",")} — " +
        "resume the stream to completion before migrating")
  }

  /** Copy every commit marker from one index to another (migration). */
  def copyCommits(spark: SparkSession, fromIndex: String, toIndex: String): Unit = {
    val from = fs(spark, fromIndex)
    val to = fs(spark, toIndex)
    to.mkdirs(new Path(s"$toIndex/_commits"))
    val src = new Path(s"$fromIndex/_commits")
    if (from.exists(src)) from.listStatus(src).foreach { st =>
      to.create(new Path(s"$toIndex/_commits/${st.getPath.getName}"), true).close()
    }
  }

}
