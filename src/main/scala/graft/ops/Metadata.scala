package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** METADATA-ONLY AGGREGATES — answer `count(*)` / `min` / `max`
  * straight from parquet footer statistics, never scanning a row. The
  * pattern every lakehouse reader (Iceberg/Delta/Hudi manifests,
  * Spark's own aggregate-pushdown for DSv2) exploits: the writer
  * already paid to emit per-row-group row counts and exact min/max
  * stats, so these aggregates cost O(files) footer reads instead of
  * O(rows) — at 100 TB with 100 MB files that is ~10⁶ footers versus
  * ~10¹² rows, and the footer reads themselves are distributed (an
  * executor-side `mapPartitions` over the file list, merged by one
  * tiny aggregate; the driver only lists paths, which is exactly the
  * manifest read any scan plans with anyway).
  *
  * Correctness contract: row-group stats for INT64/DOUBLE columns are
  * EXACT (parquet truncates only binary/string stats), `count(*)`
  * includes nulls (row counts do), and min/max ignore nulls (stats
  * do; a row group of all-null values carries empty stats and is
  * skipped). The op REFUSES (throws) when a footer lacks stats for a
  * requested column rather than silently falling back to a scan —
  * metadata-only is the contract. q173's oracle is the plain
  * full-scan SQL aggregate, so the gate proves footer==scan. */
object Metadata {

  /** Per-column footer roll-up: (nonNullMin, nonNullMax) as Long bits
    * for doubles / raw Long for int64, None when every row group so
    * far was all-null. */
  private final case class ColAcc(min: Option[Double], max: Option[Double],
                                  minL: Option[Long], maxL: Option[Long])

  /** One file's footer folded to the op's five numbers:
    * (rows, minKey, maxKey, minPrice, maxPrice) — key col all-null
    * groups impossible in practice but handled as None. */
  private def readFooter(path: String, longCol: String, dblCol: String)
    : (Long, Option[Long], Option[Long], Option[Double], Option[Double]) = {
    val in = HadoopInputFile.fromPath(new Path(path), new Configuration())
    val rd = ParquetFileReader.open(in)
    try {
      var rows = 0L
      var minL: Option[Long] = None; var maxL: Option[Long] = None
      var minD: Option[Double] = None; var maxD: Option[Double] = None
      rd.getFooter.getBlocks.asScala.foreach { b =>
        rows += b.getRowCount
        b.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString
          if (name == longCol || name == dblCol) {
            val st = cc.getStatistics
            require(st != null && (st.hasNonNullValue || st.getNumNulls >= 0),
              s"footer stats missing for $name in $path — metadata-only " +
                "aggregate cannot answer (re-write the file with stats on)")
            if (st.hasNonNullValue) {
              if (name == longCol) {
                val lo = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
                val hi = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
                minL = Some(minL.fold(lo)(math.min(_, lo)))
                maxL = Some(maxL.fold(hi)(math.max(_, hi)))
              } else {
                val lo = st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue
                val hi = st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue
                minD = Some(minD.fold(lo)(math.min(_, lo)))
                maxD = Some(maxD.fold(hi)(math.max(_, hi)))
              }
            }
          }
        }
      }
      (rows, minL, maxL, minD, maxD)
    } finally rd.close()
  }

  /** The data files under `table` (a single .parquet file or a
    * directory of part files) — the same listing any scan performs. */
  private def listDataFiles(s: SparkSession, table: String): Seq[String] = {
    val p = new Path(table)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(p.toString)
    else fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
  }

  /** q173 — `count(*)`, min/max(l_orderkey), min/max(l_extendedprice)
    * over lineitem FROM FOOTERS ONLY: file list → executor-side footer
    * reads (mapPartitions over an O(files) dataset — at 1e6 files this
    * is a real distributed job, not a driver loop) → one five-number
    * merge. The oracle runs the same aggregate as a full scan. */
  def metadataAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val files = listDataFiles(s, s"$d/lineitem.parquet")
    val per = s.createDataset(files)
      .repartition(math.min(files.size, 32))
      .map(readFooter(_, "l_orderkey", "l_extendedprice"))
      .toDF("rows", "min_key", "max_key", "min_price", "max_price")
    per.agg(
      sum("rows").as("n_rows"),
      min("min_key").as("min_key"), max("max_key").as("max_key"),
      min("min_price").as("min_price"), max("max_price").as("max_price"))
  }

  val metadataAggSql: String =
    "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
      "min(l_orderkey) AS min_key, max(l_orderkey) AS max_key, " +
      "min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price " +
      "FROM lineitem"
}
