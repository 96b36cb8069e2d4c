package graft.mergetree

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The ONE storage primitive the append-only manifest log needs: atomic
  * put-if-absent of an immutable commit object, plus list/read/delete.
  * This is the object-store commit contract (S3 `If-None-Match:*`, GCS
  * `ifGenerationMatch=0`, ABS `If-None-Match:*`): NO advisory locks, NO
  * atomic rename-onto-existing — a writer that loses the race on a
  * sequence number gets `false` back and retries on the fresh state
  * (optimistic CAS, the delta-log commit shape). The manifest log routes
  * every commit-object operation through this interface, so an
  * object-store deployment swaps ONE implementation in and the whole
  * commit protocol carries over unchanged.
  */
trait CommitBackend {

  /** Atomically create `dir/name` with `bytes` iff absent: true iff THIS
    * call published it. Losers must observe the winner's object on the
    * next read/list (read-after-write consistency for new objects — what
    * S3/GCS/ABS all guarantee today).
    */
  def putIfAbsent(dir: Path, name: String, bytes: Array[Byte]): Boolean

  /** The object's content, or None if absent (possibly compacted away
    * between a list and this read — callers re-list).
    */
  def read(dir: Path, name: String): Option[String]

  /** Names currently under `dir` (no recursion; empty if dir absent). */
  def list(dir: Path): Seq[String]

  def delete(dir: Path, name: String): Unit
}

/** Local-filesystem conditional put: hard-link a temp file onto the final
  * name — atomic, EEXIST on conflict — the same failure semantics a real
  * object store's conditional put gives. The default backend.
  */
object LocalLinkCommitBackend extends CommitBackend {

  override def putIfAbsent(dir: Path, name: String, bytes: Array[Byte]): Boolean = {
    val tmp = Files.createTempFile(dir, ".commit_", ".tmp")
    try {
      Files.write(tmp, bytes)
      Files.createLink(dir.resolve(name), tmp)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  override def read(dir: Path, name: String): Option[String] = {
    val f = dir.resolve(name)
    try Some(Files.readString(f))
    catch { case _: java.nio.file.NoSuchFileException => None } // compacted away
  }

  override def list(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Nil
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }

  override def delete(dir: Path, name: String): Unit =
    Files.deleteIfExists(dir.resolve(name))
}

/** In-memory fake of the object-store contract — the reference
  * implementation the commit protocol is tested against (ManifestLogSpec
  * races concurrent writers through it): a flat key space with compute-
  * style conditional puts, NO file system, NO locks visible to callers.
  * Counters expose the contract in action: `conflicts` counts losing
  * conditional puts (each one is a writer that detected the race and
  * retried), `puts` counts published commits.
  */
final class InMemoryCommitBackend extends CommitBackend {

  private val objects =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Array[Byte]]()
  val puts = new java.util.concurrent.atomic.AtomicLong(0)
  val conflicts = new java.util.concurrent.atomic.AtomicLong(0)

  private def key(dir: Path, name: String) = (dir.toString, name)

  override def putIfAbsent(dir: Path, name: String, bytes: Array[Byte]): Boolean = {
    val won = objects.putIfAbsent(key(dir, name), bytes.clone()) == null
    (if (won) puts else conflicts).incrementAndGet()
    won
  }

  override def read(dir: Path, name: String): Option[String] =
    Option(objects.get(key(dir, name)))
      .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))

  override def list(dir: Path): Seq[String] = {
    val d = dir.toString
    objects.keySet().asScala.iterator.collect { case (`d`, n) => n }.toList
  }

  override def delete(dir: Path, name: String): Unit =
    objects.remove(key(dir, name))
}

/** Per-table commit-backend registry: the manifest log asks here for the
  * backend serving a table path (default: the local hard-link
  * implementation). An object-store deployment registers its adapter once
  * per table (or subclasses this to key on a URI scheme).
  */
object CommitBackends {
  private val byTable =
    scala.collection.concurrent.TrieMap.empty[String, CommitBackend]

  def register(tablePath: String, backend: CommitBackend): Unit =
    byTable.put(tablePath, backend)

  def unregister(tablePath: String): Unit = byTable.remove(tablePath)

  def forTable(tablePath: String): CommitBackend =
    byTable.getOrElse(tablePath, LocalLinkCommitBackend)
}
