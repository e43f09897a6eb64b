package graft.tabjolt

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import scala.collection.concurrent.TrieMap

/** In-JVM object store shared by every [[MockObjectStoreFileSystem]]
  * instance — the "S3" the sandbox doesn't have. Objects are
  * (bucket, key) → bytes; there are no real directories, exactly like
  * S3: a "directory" exists only as a key prefix with objects under it.
  */
object MockObjectStore {
  val objects: TrieMap[(String, String), Array[Byte]] = TrieMap.empty

  def put(bucket: String, key: String, bytes: Array[Byte]): Unit =
    objects.put((bucket, key), bytes)

  def clear(): Unit = objects.clear()
}

/** Hadoop FileSystem over [[MockObjectStore]], claiming `mockfs://`.
  *
  * This is the test double for SURVEY §2 S1 (the reference's per-file S3
  * pull, tabjolt_email.py:17-31): it binds through the SAME
  * `fs.<scheme>.impl` conf lookup that binds `s3a://` to S3AFileSystem
  * on a deployment classpath, and it emulates OBJECT-STORE semantics —
  * bucket in the URI authority, flat key space, directories that exist
  * only as prefixes, single-pass writes published at close() — so the
  * fetch + ingest path is exercised against the semantics it will meet
  * in production, not against a local filesystem wearing a scheme. */
class MockObjectStoreFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var bucket: String = _
  private var cwd: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    bucket = Option(name.getAuthority).getOrElse("")
    fsUri = URI.create(s"${name.getScheme}://$bucket")
  }

  override def getScheme: String = "mockfs"
  override def getUri: URI = fsUri

  /** Bucket-relative key for a path ("" for the bucket root). */
  private def key(f: Path): String = {
    val p = makeQualified(f).toUri.getPath
    p.stripPrefix("/").stripSuffix("/")
  }

  private def obj(f: Path): Option[Array[Byte]] =
    MockObjectStore.objects.get((bucket, key(f)))

  private def status(f: Path): FileStatus = {
    val k = key(f)
    obj(f) match {
      case Some(bytes) =>
        new FileStatus(bytes.length.toLong, false, 1, 64L * 1024 * 1024, 0L,
          makeQualified(f))
      case None =>
        val prefix = if (k.isEmpty) "" else k + "/"
        val isDir = k.isEmpty || MockObjectStore.objects.keysIterator
          .exists { case (b, kk) => b == bucket && kk.startsWith(prefix) }
        if (!isDir) throw new FileNotFoundException(s"mockfs://$bucket/$k")
        new FileStatus(0L, true, 1, 0L, 0L, makeQualified(f))
    }
  }

  override def getFileStatus(f: Path): FileStatus = status(f)

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (obj(f).isDefined) return Array(status(f))
    val prefix = if (k.isEmpty) "" else k + "/"
    val children = MockObjectStore.objects.keysIterator
      .collect { case (b, kk) if b == bucket && kk.startsWith(prefix) =>
        // first path segment under the prefix: a file (exact object) or
        // an emulated sub-directory
        val rest = kk.stripPrefix(prefix)
        rest.takeWhile(_ != '/')
      }.toSet
    if (children.isEmpty && k.nonEmpty) throw new FileNotFoundException(f.toString)
    children.toArray.sorted.map(c => status(new Path(s"/$prefix$c")))
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = obj(f).getOrElse(throw new FileNotFoundException(f.toString))
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && obj(f).isDefined)
      throw new IOException(s"already exists: $f")
    val k = key(f)
    val buf = new ByteArrayOutputStream()
    // object-store write semantics: the object appears only at close()
    val out = new java.io.FilterOutputStream(buf) {
      override def close(): Unit = {
        super.close()
        MockObjectStore.put(bucket, k, buf.toByteArray)
      }
    }
    new FSDataOutputStream(out, null)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores do not append")

  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src); val dk = key(dst)
    MockObjectStore.objects.remove((bucket, sk)) match {
      case Some(bytes) => MockObjectStore.put(bucket, dk, bytes); true
      case None =>
        // prefix rename (directory move): copy every key under src/
        val moved = MockObjectStore.objects.keysIterator
          .filter { case (b, kk) => b == bucket && kk.startsWith(sk + "/") }
          .toList
        moved.foreach { case id @ (_, kk) =>
          MockObjectStore.objects.remove(id).foreach { bytes =>
            MockObjectStore.put(bucket, dk + "/" + kk.stripPrefix(sk + "/"), bytes)
          }
        }
        moved.nonEmpty
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (MockObjectStore.objects.remove((bucket, k)).isDefined) return true
    val under = MockObjectStore.objects.keysIterator
      .filter { case (b, kk) => b == bucket && kk.startsWith(k + "/") }.toList
    if (under.nonEmpty && !recursive)
      throw new IOException(s"non-empty directory: $f")
    under.foreach(MockObjectStore.objects.remove)
    under.nonEmpty
  }

  override def setWorkingDirectory(dir: Path): Unit = cwd = dir
  override def getWorkingDirectory: Path = cwd

  override def mkdirs(f: Path, permission: FsPermission): Boolean = true
}

/** Seekable in-memory stream satisfying FSDataInputStream's contract. */
private class SeekableBytes(bytes: Array[Byte])
    extends FSInputStream {
  private var pos: Int = 0
  override def seek(p: Long): Unit = {
    if (p < 0 || p > bytes.length) throw new IOException(s"bad seek $p")
    pos = p.toInt
  }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(): Int =
    if (pos >= bytes.length) -1
    else { val b = bytes(pos) & 0xff; pos += 1; b }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= bytes.length) return -1
    val n = math.min(len, bytes.length - pos)
    System.arraycopy(bytes, pos, b, off, n)
    pos += n
    n
  }
  override def available(): Int = bytes.length - pos
}
