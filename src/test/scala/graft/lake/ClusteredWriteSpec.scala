package graft.lake

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** appendClustered's claim, verified on the actual Parquet footers: with
  * rows sorted on the cluster key inside each write task, every row
  * group's min/max stats cover a NARROW key range (so a key predicate
  * skips most row groups), while the plain unsorted append leaves every
  * row group spanning ~the whole key domain (nothing skippable). */
class ClusteredWriteSpec extends SparkSpec {

  private def rowGroupKeyRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    files.toSeq.flatMap { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          val colMeta = block.getColumns.asScala
            .find(_.getPath.toDotString == column).get
          val stats = colMeta.getStatistics
          (stats.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            stats.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        }
      } finally reader.close()
    }
  }

  test("clustered append yields narrow row-group key ranges; plain append does not") {
    val conf = spark.sparkContext.hadoopConfiguration
    val oldBlock = conf.get("parquet.block.size")
    conf.setInt("parquet.block.size", 128 * 1024) // force many row groups
    try {
      // one day of data, keys shuffled: the worst case for stats pruning
      val df = spark.range(400000).select(
        pmod(hash(col("id")), lit(10000)).cast("long").as("user_id"),
        lit("2024-03-01 12:00:00").cast("timestamp").as("ts"),
        col("id").as("payload"))

      val plainRoot = Files.createTempDirectory("lake-plain").toString
      val clusRoot = Files.createTempDirectory("lake-clustered").toString
      LakeWriter.append(df, plainRoot, "events", "ts")
      LakeWriter.appendClustered(df, clusRoot, "events", "ts", Seq("user_id"))

      val partDir = "events/year=2024/month=3/day=1"
      val plain = rowGroupKeyRanges(s"$plainRoot/$partDir", "user_id")
      val clustered = rowGroupKeyRanges(s"$clusRoot/$partDir", "user_id")
      assert(clustered.size > 3, s"need several row groups, got ${clustered.size}")

      def avgWidth(rs: Seq[(Long, Long)]) =
        rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.size
      val domain = 9999.0
      // unsorted: every row group spans ~the whole domain
      assert(avgWidth(plain) > domain * 0.8,
        s"plain append unexpectedly clustered: ${avgWidth(plain)}")
      // clustered: row groups cover slivers — a point/range predicate
      // skips all but ~one of them on min/max stats alone
      assert(avgWidth(clustered) < domain * 0.25,
        s"clustered width ${avgWidth(clustered)} not narrow vs $domain")
      // and the slivers are ordered: sorted by min, ranges barely overlap
      val sorted = clustered.sortBy(_._1)
      val overlaps = sorted.sliding(2).count {
        case Seq((_, hi1), (lo2, _)) => lo2 < hi1 - 1
        case _ => false
      }
      assert(overlaps <= sorted.size / 4,
        s"$overlaps of ${sorted.size} adjacent row groups overlap")
    } finally {
      if (oldBlock == null) conf.unset("parquet.block.size")
      else conf.set("parquet.block.size", oldBlock)
    }
  }
}
