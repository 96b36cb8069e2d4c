package graft.mergetree

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

/** Compatibility WRITER for the reference engine's on-disk part format —
  * the inverse of RefFormatReader, completing O26 round-trip: a part written
  * here is byte-compatible with what the C++ engine produces and therefore
  * readable by it (verified in tests by byte-comparing against the
  * C++-written fixtures under /root/reference/data/).
  *
  * Format (reference: src/serialization.cpp:8-29,157-178;
  * src/sparse_index.cpp:45-59; src/part.cpp:125-161):
  *   granule_<i>_keys.bin / _values.bin : u64 count, then per string
  *                                        u64 len + bytes (little-endian)
  *   granule_<i>_timestamps.bin         : u64 count, then count × u64 (LE)
  *   primary.idx                        : u64 n, then per granule
  *                                        min_key, max_key (str),
  *                                        u64 granule_index, u64 row_count
  *   metadata.bin                       : u64 part_id, min_key, max_key,
  *                                        u64 ×6: min_ts, max_ts, row_count,
  *                                        granule_count, disk_size,
  *                                        creation_time
  *
  * Like the reader this is a driver-side fixture/interop shim, not a scale
  * path — bulk data lives in parquet parts.
  */
object RefFormatWriter {

  val GranuleSize = 8192 // reference constant, src/granule.h:10

  private def writeU64(out: DataOutputStream, v: Long): Unit = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
    out.write(b.array())
  }

  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    writeU64(out, bytes.length.toLong)
    out.write(bytes)
  }

  private def withOut[A](p: Path)(f: DataOutputStream => A): A = {
    val out = new DataOutputStream(new BufferedOutputStream(Files.newOutputStream(p)))
    try f(out) finally out.close()
  }

  /** Write `rows` as one reference-format part directory. Rows are sorted
    * by (key, timestamp) and chunked into 8192-row granules exactly like
    * Part::write_from_memtable_rows (src/part.cpp:39-65).
    */
  def writePart(partDir: String, partId: Long, rows: Seq[KVRow],
                creationTime: Long = System.currentTimeMillis() / 1000): Unit = {
    require(rows.nonEmpty, "reference format has no empty-part representation")
    val dir = Paths.get(partDir)
    Files.createDirectories(dir)
    // UTF-8 BYTE order (KeyOrder), not Java's UTF-16 String order: the C++
    // engine sorts std::string keys byte-wise (src/row.h:18), and the two
    // orders diverge on supplementary-plane characters — a mis-sorted part
    // would break the engine's sparse-index pruning on these fixtures.
    val sorted = rows.sortBy(r => (r.key, r.timestamp))(
      Ordering.Tuple2(KeyOrder.ordering, Ordering.Long))
    val granules = sorted.grouped(GranuleSize).toIndexedSeq

    granules.zipWithIndex.foreach { case (g, i) =>
      withOut(dir.resolve(s"granule_${i}_keys.bin")) { out =>
        writeU64(out, g.size.toLong); g.foreach(r => writeStr(out, r.key))
      }
      withOut(dir.resolve(s"granule_${i}_values.bin")) { out =>
        writeU64(out, g.size.toLong); g.foreach(r => writeStr(out, r.value))
      }
      withOut(dir.resolve(s"granule_${i}_timestamps.bin")) { out =>
        writeU64(out, g.size.toLong); g.foreach(r => writeU64(out, r.timestamp))
      }
    }

    // sparse index: one entry per granule (src/sparse_index.cpp:45-59)
    withOut(dir.resolve("primary.idx")) { out =>
      writeU64(out, granules.size.toLong)
      granules.zipWithIndex.foreach { case (g, i) =>
        writeStr(out, g.head.key)
        writeStr(out, g.last.key)
        writeU64(out, i.toLong)
        writeU64(out, g.size.toLong)
      }
    }

    val diskSize = {
      val s = Files.list(dir)
      try s.filter(p => p.getFileName.toString != "metadata.bin")
        .mapToLong(Files.size(_)).sum()
      finally s.close()
    }
    withOut(dir.resolve("metadata.bin")) { out =>
      writeU64(out, partId)
      writeStr(out, sorted.head.key)
      writeStr(out, sorted.last.key)
      writeU64(out, sorted.map(_.timestamp).min)
      writeU64(out, sorted.map(_.timestamp).max)
      writeU64(out, sorted.size.toLong)
      writeU64(out, granules.size.toLong)
      writeU64(out, diskSize)
      writeU64(out, creationTime)
    }
  }

  /** Export a whole MergeTree table (its deduplicated, sorted view) as one
    * reference-format part — the interop path for handing data back to the
    * C++ engine.
    */
  def exportTable(table: MergeTreeTable, outDir: String, partId: Long = 1L): Unit =
    writePart(Paths.get(outDir, s"part_$partId").toString, partId,
      table.fullScan().collect().toSeq)
}
