package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

/** Filesystem facade for every store path operation, backed by Hadoop
  * `FileSystem`/`FileContext` so the SAME store code runs against
  * `file://`, `hdfs://` and `s3a://` roots — the 100 TB deployment
  * story. A local root behaves exactly as before (schemeless absolute
  * paths resolve through the local filesystem); a cluster points the
  * catalog root at a distributed URI and the meta/delta commit
  * protocol inherits that filesystem's rename atomicity (HDFS rename
  * is atomic; `moveOver` uses `Options.Rename.OVERWRITE`, the atomic
  * replace HDFS provides and `java.nio`'s ATOMIC_MOVE+REPLACE used to
  * supply locally).
  *
  * Paths render with `toString` wherever Spark reads/writes parquet,
  * so scheme-qualified URIs flow through the scan/commit unchanged.
  */
private[graft] final class StorePath private (val hp: HPath) {
  private def fs: FileSystem = StorePath.fsFor(hp)

  def resolve(child: String): StorePath = new StorePath(new HPath(hp, child))
  def parent: StorePath = new StorePath(hp.getParent)
  def name: String = hp.getName
  override def toString: String = hp.toString

  override def equals(o: Any): Boolean = o match {
    case s: StorePath => s.hp == hp
    case _ => false
  }
  override def hashCode: Int = hp.hashCode

  def exists: Boolean = fs.exists(hp)
  def isDirectory: Boolean = exists && fs.getFileStatus(hp).isDirectory
  def createDirectories(): Unit = { fs.mkdirs(hp); () }
  def modifiedAt: Long = fs.getFileStatus(hp).getModificationTime

  def list: Seq[StorePath] =
    if (!exists) Seq.empty
    else fs.listStatus(hp).toSeq.map(st => new StorePath(st.getPath))

  /** Total bytes under the path (file length or recursive dir sum). */
  def totalSize: Long =
    if (!exists) 0L else fs.getContentSummary(hp).getLength

  def readBytes: Array[Byte] = {
    // Stream to EOF rather than pre-statting the length: a stat
    // followed by an open can straddle an atomic replace (stat the
    // old file, open the new one) and deliver a truncated read. Once
    // open, the stream is pinned to one version of the file.
    val in = fs.open(hp)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def writeBytes(bytes: Array[Byte]): Unit = {
    val out = fs.create(hp, true)
    try out.write(bytes) finally out.close()
  }

  /** Create-exclusive write: succeeds only if the file did not exist
    * (atomic on local and HDFS — the namenode/POSIX O_EXCL create;
    * object stores without conditional PUT cannot give this guarantee,
    * the same caveat as [[moveOver]]). The lock-file primitive for
    * cross-process leases.
    */
  def createExclusive(bytes: Array[Byte]): Boolean =
    try {
      val out = fs.create(hp, false)
      try out.write(bytes) finally out.close()
      true
    } catch {
      case _: java.io.IOException => false
    }

  /** Atomic rename; fails if `to` already exists. */
  def moveTo(to: StorePath): Unit =
    StorePath.ctxFor(hp).rename(hp, to.hp)

  /** Atomic rename REPLACING an existing destination (the meta.json
    * swap discipline — concurrent readers never observe a torn or
    * missing file), dispatched to each filesystem's native atomic
    * replace:
    *  - local: POSIX rename(2) via java.nio ATOMIC_MOVE — Hadoop's
    *    own local layer REFUSES an existing destination (it emulates
    *    HDFS `rename`), and its FileContext Rename.OVERWRITE is
    *    delete-then-rename, which opens a missing-file window
    *    concurrent readers would hit;
    *  - HDFS (and other schemes): FileContext Rename.OVERWRITE, the
    *    namenode-atomic replace. (Object stores have no atomic
    *    rename at all — a production S3 deployment keeps data/delta
    *    files here but moves the meta pointer into a transactional
    *    metastore, the standard lakehouse split.)
    */
  def moveOver(to: StorePath): Unit =
    if (fs.getUri.getScheme == "file")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(hp.toUri.getPath),
        java.nio.file.Paths.get(to.hp.toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    else
      StorePath.ctxFor(hp).rename(hp, to.hp, Options.Rename.OVERWRITE)

  def deleteRecursively(): Unit = { if (exists) fs.delete(hp, true); () }
}

private[graft] object StorePath {
  // Default Hadoop configuration: resolves file:// locally and honors
  // HADOOP_CONF_DIR / core-site.xml on a cluster.
  private val conf = new Configuration()

  // Store-private FileSystem instances (NOT the global Hadoop cache
  // Spark's scans share), with CRC sidecars disabled: the local
  // filesystem is ChecksumFileSystem, whose `.crc` files rename
  // separately from the data file — a reader racing the meta.json
  // overwrite-rename would see the new file against the old checksum.
  // The store's atomicity discipline is the rename itself; sidecar
  // checksums only break it. (HDFS/S3A checksum natively — the flags
  // are no-ops there.)
  private val fsCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()
  private def fsFor(p: HPath): FileSystem = {
    val uri = p.getFileSystem(conf).getUri
    fsCache.computeIfAbsent(uri.toString, _ => {
      val fs = FileSystem.newInstance(uri, conf)
      fs.setWriteChecksum(false)
      fs.setVerifyChecksum(false)
      fs
    })
  }
  // Renames only (no reads/writes go through the context, so the
  // checksum flags above don't apply here; with no `.crc` sidecars
  // ever written, ChecksumFs rename is the single data-file rename).
  private def ctxFor(p: HPath): FileContext =
    FileContext.getFileContext(fsFor(p).getUri, conf)

  def apply(s: String): StorePath = new StorePath(new HPath(s))
}
