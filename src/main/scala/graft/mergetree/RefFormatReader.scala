package graft.mergetree

import org.apache.spark.sql.{Dataset, SparkSession}

import java.io.DataInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Compatibility reader for the reference engine's on-disk part format
  * (O26), so the C++-written fixtures under /root/reference/data/ can be
  * ingested as cross-validation inputs (SURVEY §5.1).
  *
  * Format (reference: src/serialization.cpp:8-29,86-127,157-178):
  *   granule_<i>_keys.bin / _values.bin : u64 count, then per string
  *                                        u64 len + bytes (little-endian)
  *   granule_<i>_timestamps.bin         : u64 count, then count × u64 (LE)
  *   metadata.bin (src/part.cpp:125-161): u64 part_id, min_key (str),
  *     max_key (str), then u64 ×6: min_ts, max_ts, row_count,
  *     granule_count, disk_size, creation_time
  *
  * Fixture files are tiny (≤ a few MiB); parsing happens on the driver and
  * the rows are parallelized into a Dataset. This is an ingest shim for
  * test fixtures, not a scale path — real data lives in parquet parts.
  */
object RefFormatReader {

  final case class RefPartMetadata(
      partId: Long, minKey: String, maxKey: String,
      minTimestamp: Long, maxTimestamp: Long, rowCount: Long,
      granuleCount: Long, diskSize: Long, creationTime: Long)

  private def readU64(in: DataInputStream): Long = {
    val b = new Array[Byte](8)
    in.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
  }

  private def readStr(in: DataInputStream): String = {
    val len = readU64(in).toInt
    val b = new Array[Byte](len)
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def readStringVector(p: Path): IndexedSeq[String] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(Files.newInputStream(p)))
    try {
      val n = readU64(in).toInt
      (0 until n).map(_ => readStr(in))
    } finally in.close()
  }

  private def readU64Vector(p: Path): IndexedSeq[Long] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(Files.newInputStream(p)))
    try {
      val n = readU64(in).toInt
      (0 until n).map(_ => readU64(in))
    } finally in.close()
  }

  def readMetadata(partDir: String): RefPartMetadata = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(partDir, "metadata.bin"))))
    try {
      RefPartMetadata(
        partId = readU64(in),
        minKey = readStr(in), maxKey = readStr(in),
        minTimestamp = readU64(in), maxTimestamp = readU64(in),
        rowCount = readU64(in), granuleCount = readU64(in),
        diskSize = readU64(in), creationTime = readU64(in))
    } finally in.close()
  }

  /** All rows of one reference part directory, granule by granule. */
  def readPartRows(partDir: String): Seq[KVRow] = {
    val dir = Paths.get(partDir)
    val granuleIds = {
      val st = Files.list(dir)
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("granule_") && s.endsWith("_keys.bin") =>
          s.stripPrefix("granule_").stripSuffix("_keys.bin").toInt
        }
        .toSeq.sorted
      finally st.close() // Files.list leaks an FD until closed
    }
    val rows = new ArrayBuffer[KVRow]()
    granuleIds.foreach { g =>
      val keys = readStringVector(dir.resolve(s"granule_${g}_keys.bin"))
      val values = readStringVector(dir.resolve(s"granule_${g}_values.bin"))
      val tss = readU64Vector(dir.resolve(s"granule_${g}_timestamps.bin"))
      require(keys.size == values.size && keys.size == tss.size,
        s"column length mismatch in $partDir granule $g")
      var i = 0
      while (i < keys.size) { rows += KVRow(keys(i), values(i), tss(i)); i += 1 }
    }
    rows.toSeq
  }

  /** All rows of a reference table directory (every part_<id>/ subdir).
    * Caution: the reference never GCs merged-away dirs (SURVEY §3.3), so on
    * post-merge fixtures this returns duplicates; prefer per-part reads or
    * the non-merge fixtures.
    */
  def readTable(spark: SparkSession, tableDir: String): Dataset[KVRow] = {
    import spark.implicits._
    val partDirs = {
      val st = Files.list(Paths.get(tableDir))
      try st.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("part_"))
        .map(_.toString).toSeq.sorted
      finally st.close()
    }
    spark.createDataset(partDirs.flatMap(readPartRows))
  }
}
