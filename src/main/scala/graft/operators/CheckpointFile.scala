package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Shared `iterator_cp_file` plumbing (reference
  * milvus_client/query_iterator.py:104-163) used by BOTH resumable
  * iterators ([[QueryIterator]]'s lastPk cursor and
  * [[SearchIterator]]'s (score, pk) cursor): a tiny JSON object
  * `{"sig": ..., <fields>}` written atomically (temp file +
  * ATOMIC_MOVE) so a crash mid-write can never leave a torn
  * checkpoint, and guarded by a signature of the scan's identity so a
  * file written for one scan cannot silently resume a different one.
  */
private[operators] object CheckpointFile {

  /** 8-byte hex SHA-256 of the scan-identity string. */
  def signature(raw: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(raw.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** Atomic write of `{"sig": "<sig>", <fields>}`; `fields` values
    * must already be JSON-rendered (use [[pkJson]] for pk values).
    */
  def save(file: String, sig: String, fields: Seq[(String, String)]): Unit = {
    val body = (s""""sig": "$sig"""" +:
      fields.map { case (k, v) => s""""$k": $v""" })
      .mkString("{", ", ", "}")
    // Unique temp name per save: a fixed '<file>.tmp' shared by two
    // handles configured with the same path could interleave writes or
    // race the ATOMIC_MOVE (NoSuchFileException) — the sig guard
    // catches cross-scan resume, not this write race.
    val target = Paths.get(file).toAbsolutePath
    val dir = Option(target.getParent).getOrElse(Paths.get("."))
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, target.getFileName.toString, ".tmp")
    try {
      Files.write(tmp, body.getBytes)
      Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
  }

  /** Read the checkpoint body, enforcing the signature guard. Returns
    * None when the file does not exist; throws when it was written
    * for a different scan (`what` names the scan kind in the error).
    */
  def load(file: String, sig: String, what: String): Option[String] = {
    val p = Paths.get(file)
    if (!Files.exists(p)) None
    else {
      val body = new String(Files.readAllBytes(p))
      val fileSig =
        "\"sig\": \"([^\"]+)\"".r.findFirstMatchIn(body).map(_.group(1))
      if (!fileSig.contains(sig))
        throw new IllegalStateException(
          s"checkpoint $file was written for a different $what " +
            s"(sig ${fileSig.orNull} != $sig)")
      Some(body)
    }
  }

  /** JSON-render a pk value (strings escaped, numerics verbatim). */
  def pkJson(v: Any): String = v match {
    case s: String =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case other => other.toString
  }

  /** Parse a pk value back (inverse of [[pkJson]]; bare numerics with
    * a '.' read as Double, otherwise Long).
    */
  def parsePk(s: String): Any =
    if (s.startsWith("\""))
      s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
    else if (s.contains('.')) s.toDouble
    else s.toLong
}
