package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format edges beyond parquet (the reference has no file I/O
  * at all — SURVEY.md §2.2 — so this is pure extension surface).
  * Schemas are always EXPLICIT: on a 100 TB lake, schema inference
  * means a full extra pass over the data; the loaders below refuse
  * to infer.
  *
  * Writer notes for scale: partitionBy for pruning-friendly layout;
  * caller controls file count via the frame's partitioning (a
  * `.repartition(n)` before write = n files per partition dir).
  */
object FileFormats {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE") // undecodable rows -> nulls, the
      // file-format analog of the safe-decode DLT contract
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.option("header", header.toString).mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).csv(path)
  }

  def writeJsonLines(df: DataFrame, path: String,
                     partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }

  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC edge — the other columnar lake format Spark ships natively;
    * same pushdown/pruning machinery as parquet (predicate pushdown
    * via ORC search arguments). */
  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String,
               partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
