package graft.workload

import graft.store.StorePath

/** Hadoop-FileSystem checkpoint IO for the workload bricks.
  *
  * The reference bricks persist phase checkpoints and result JSONs on
  * a local `--checkpoint-dir` (common/args.py:29-42). Here the same
  * read / atomic-write / list protocol runs through
  * [[graft.store.StorePath]] — the store's Hadoop `FileSystem` facade —
  * so a scenario's checkpoint root can be `file://`, `hdfs://` or
  * `s3a://` exactly like the collection store, and an upgrade/rollback
  * drill runs end-to-end against a distributed root. Writes keep the
  * tmp-file + atomic-rename-over discipline (a brick restarted
  * mid-write never reads a torn checkpoint).
  */
private[workload] object CheckpointIO {

  def resolve(dir: String, child: String): String =
    StorePath(dir).resolve(child).toString

  def exists(path: String): Boolean = StorePath(path).exists

  def mkdirs(dir: String): Unit = StorePath(dir).createDirectories()

  def readString(path: String): String =
    new String(StorePath(path).readBytes, "UTF-8")

  /** tmp-write + rename-over (atomic on local and HDFS) — concurrent
    * readers observe either the old or the new checkpoint, never a
    * torn one.
    */
  def writeAtomic(path: String, content: String): Unit = {
    val p = StorePath(path)
    Option(p.hp.getParent)
      .foreach(par => StorePath(par.toString).createDirectories())
    val tmp = StorePath(path + ".tmp")
    tmp.writeBytes(content.getBytes("UTF-8"))
    tmp.moveOver(p)
  }

  /** `(stem, path)` for each `<stem>.json` directly under `dir`
    * (empty when the dir is absent).
    */
  def listJson(dir: String): Seq[(String, String)] =
    StorePath(dir).list
      .filter(_.name.endsWith(".json"))
      .map(p => (p.name.stripSuffix(".json"), p.toString))
      .sortBy(_._1)
}
