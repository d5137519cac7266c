package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.file.{Files, FileAlreadyExistsException, Paths, StandardOpenOption}

/** The commit-publish primitive DeltaLite's optimistic concurrency
  * stands on: atomically materialize `bytes` at `fin` IF AND ONLY IF
  * nothing exists there, reporting which writer won. Everything else
  * in the log protocol (version chaining, retry, conflict
  * classification) is layered on this one conditional put — exactly
  * the seam Delta's LogStore abstracts, because the safe primitive
  * differs per store:
  *
  *  - HDFS: `rename` fails when the destination exists → temp-file +
  *    rename IS a conditional put ([[RenameCommitStore]]).
  *  - POSIX local filesystems: `rename(2)` silently REPLACES the
  *    destination — two processes can both "win" and one commit is
  *    lost. The atomic create-if-absent primitive is `link(2)`:
  *    hard-linking a fully-written temp file to the final name fails
  *    with EEXIST when the name is taken, atomically and across
  *    processes ([[LinkCommitStore]]). Readers never see a partial
  *    record: the link appears with the temp file's complete bytes.
  *  - S3-class object stores: rename is copy+delete and NOT
  *    conditional; a deployment there must plug a store built on the
  *    store's own conditional put (S3 `If-None-Match`, GCS
  *    `ifGenerationMatch=0`, ABFS ETag) or an external coordinator —
  *    the same contract Delta requires of its S3 LogStore. The seam
  *    is this trait; [[DeltaLite]] takes the store as a constructor
  *    default resolved per filesystem scheme by [[CommitStore.forFs]].
  *
  * Contract (what [[CommitStoreSpec]] drives on every impl):
  *  1. At most one of any set of concurrent `putIfAbsent(fin, _)`
  *     callers returns true (across threads AND processes).
  *  2. After any call returns, `fin` exists with the COMPLETE bytes
  *     of exactly one caller — never a torn or empty record.
  *  3. A false return leaves no temp debris behind.
  */
trait CommitStore {

  /** Publish `bytes` at `fin` iff absent. True = this writer won;
    * false = the destination already existed (lost the race).
    */
  def putIfAbsent(fin: Path, bytes: Array[Byte]): Boolean
}

/** Temp-file + exists-check + rename, serialized per target directory
  * within this JVM. Cross-process atomicity is the filesystem's
  * rename-if-absent contract — correct on HDFS, where rename onto an
  * existing path fails; NOT safe cross-process on POSIX local
  * filesystems (rename replaces) — use [[LinkCommitStore]] there.
  */
class RenameCommitStore(fs: FileSystem) extends CommitStore {
  override def putIfAbsent(fin: Path, bytes: Array[Byte]): Boolean = {
    val dir = fin.getParent
    val tmp = new Path(dir,
      s".${fin.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    CommitStore.dirLock(dir.toString).synchronized {
      if (fs.exists(fin)) { fs.delete(tmp, false); false }
      else if (fs.rename(tmp, fin)) true
      else { fs.delete(tmp, false); sys.error(s"commit rename failed for $fin") }
    }
  }
}

/** POSIX put-if-absent: write a temp file, then `link(2)` it to the
  * final name — the kernel refuses (EEXIST) atomically when the name
  * is taken, across processes, with no lock. The only store here that
  * makes a `file://` table root safe for MULTIPLE JVMs (the
  * cross-process OCC spec drives two real processes through it).
  * Writes go through java.nio directly — no Hadoop `.crc` sidecars;
  * readers on the Hadoop local FS simply skip the absent checksum.
  */
class LinkCommitStore extends CommitStore {
  override def putIfAbsent(fin: Path, bytes: Array[Byte]): Boolean = {
    val finLocal = Paths.get(fin.toUri.getPath)
    Files.createDirectories(finLocal.getParent)
    val tmp = finLocal.resolveSibling(
      s".${finLocal.getFileName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, bytes,
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    try {
      try { Files.createLink(finLocal, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }
}

/** The one call a cloud object store must supply for a safe commit
  * log: create `key` with `bytes` IFF no object exists there, as ONE
  * atomic store-side operation. The 1:1 mapping per store:
  *
  *  - S3: `PutObject` with header `If-None-Match: *` → true on 200,
  *    false on 412 `PreconditionFailed` (S3 applies the precondition
  *    atomically at completion under its strong consistency).
  *  - GCS: `objects.insert` with `ifGenerationMatch=0` → true on 200,
  *    false on 412.
  *  - Azure ADLS/ABFS: `Put Blob` / create with `If-None-Match: *` →
  *    true on 201, false on 409/412 (ETag precondition).
  *  - Anything without a conditional put needs an external
  *    coordinator (e.g. a lock table) presenting this same call.
  *
  * Two laws an impl must honor beyond create-iff-absent:
  *  - VISIBILITY: a `false` return implies the existing object is
  *    already durable and readable — the caller re-lists the log to
  *    classify the conflict, and an invisible winner would make it
  *    replay an empty/short log (S3/GCS/ABFS give this via strong
  *    read-after-write consistency; anything eventually-consistent
  *    cannot back a commit log).
  *  - Retry: a network timeout AFTER the body was sent is ambiguous
  *    (the put may have landed) — re-GET and compare bytes before
  *    reporting false, or surface the error; never blind-retry into
  *    a false "lost the race".
  */
trait ObjectStoreClient {
  def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean

  /** Read the object at `key` (None when absent) — S3 `GetObject`,
    * GCS `objects.get`, ABFS read. The retry law's resolution step:
    * after an ambiguous timeout, [[EtagCommitStore]] GETs and compares
    * bytes instead of blind-retrying (see the law above).
    */
  def get(key: String): Option[Array[Byte]]
}

/** Conditional-put commit store for S3-class object stores — the
  * worked example behind the trait scaladoc's "plug a store built on
  * the store's own conditional put". The entire OCC burden reduces to
  * [[ObjectStoreClient.putIfNoneMatch]]: no temp objects, no renames
  * (S3 has none that are atomic), no lock — one conditional PUT per
  * commit. Run [[CommitStoreContract.verify]] against a production
  * client before trusting it ([[graft.CommitStoreSpec]] drives this
  * impl through the contract and the 32-thread race on
  * [[FakeObjectStore]]).
  */
class EtagCommitStore(client: ObjectStoreClient) extends CommitStore {
  override def putIfAbsent(fin: Path, bytes: Array[Byte]): Boolean = {
    val key = fin.toUri.getPath
    var attempts = 0
    while (true) {
      attempts += 1
      try return client.putIfNoneMatch(key, bytes)
      catch {
        case e: java.io.IOException =>
          // AMBIGUOUS TIMEOUT: the request may have completed after
          // the ack was lost. Resolve by re-GET + byte compare — the
          // retry law. A blind re-put would see its OWN object and
          // report a false "lost the race": the caller then believes
          // the commit failed while its record sits in the log, and a
          // retried batch double-applies at the next version.
          client.get(key) match {
            case Some(b) if java.util.Arrays.equals(b, bytes) =>
              return true // our body landed — we won
            case Some(_) =>
              return false // a rival's object is durable and visible
            case None =>
              // nothing landed: the send itself failed — safe to
              // re-send (bounded; then surface the error)
              if (attempts >= 3) throw e
          }
      }
    }
    false // unreachable
  }
}

/** In-memory object store with S3-strong-consistency conditional-put
  * semantics. The load-bearing property (and the one a weaker fake
  * gets wrong): a FAILED conditional put implies the winning object
  * is already DURABLE AND READABLE — S3 serializes concurrent PUTs
  * and evaluates `If-None-Match` against committed state, so a 412
  * loser that immediately re-lists the log MUST see the winner's
  * commit (DeltaLite's conflict-retry logic depends on exactly this
  * to re-read the conflicting commit before retrying; a fake that
  * reserved the key before writing the body handed losers an empty
  * log and broke the retry). Modeled here by performing the body
  * write INSIDE the per-key atomic `compute`: the loser's call blocks
  * until the winner's temp + ATOMIC_MOVE completed, so `false`
  * returns only once the object is visible; a failed write
  * propagates without establishing the mapping (the real store has
  * no reserved-but-absent state). Single-JVM by construction (a test
  * double for the store's server-side atomicity, not a distributed
  * coordinator); the contract harness and the DeltaLite exactly-once
  * race both drive it.
  */
class FakeObjectStore extends ObjectStoreClient {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean = {
    var won = false
    objects.compute(key, (_, existing) => {
      if (existing == null) {
        val p = Paths.get(key)
        Files.createDirectories(p.getParent)
        val tmp = Files.createTempFile(p.getParent,
          s".${p.getFileName}", ".upload")
        Files.write(tmp, bytes)
        Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        won = true
      }
      java.lang.Boolean.TRUE
    })
    won
  }
  override def get(key: String): Option[Array[Byte]] =
    // committed-state read (S3 strong consistency): the mapping only
    // exists once the body is durably visible
    if (objects.containsKey(key)) Some(Files.readAllBytes(Paths.get(key)))
    else None
}

object CommitStore {

  // per-target-directory publish serialization within one JVM for the
  // rename store (exists-check + rename must not interleave between
  // threads; the link store needs no lock — the kernel arbitrates)
  private val dirLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[etl] def dirLock(dir: String): Object =
    dirLocks.computeIfAbsent(dir, _ => new Object)

  /** The safe default store for `fs`: link-based put-if-absent on
    * local filesystems (cross-process atomic), rename-if-absent
    * elsewhere (atomic on HDFS-class stores). An S3-class scheme gets
    * the rename store too — matching Delta's own out-of-the-box
    * posture — but a production deployment there must supply a
    * conditional-put store explicitly (see the trait scaladoc).
    */
  def forFs(fs: FileSystem): CommitStore =
    if (fs.getScheme == "file") new LinkCommitStore
    else new RenameCommitStore(fs)
}
