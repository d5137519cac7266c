package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Executable contract for ANY [[CommitStore]] — the verification kit
  * a deployment plugging its own store (S3 `If-None-Match`, GCS
  * generation-match, a DynamoDB coordinator…) runs BEFORE trusting it
  * with a commit log, driving the three laws of the trait scaladoc:
  *
  *  1. of any set of concurrent `putIfAbsent(fin, _)` callers, exactly
  *     ONE returns true;
  *  2. afterwards `fin` holds the winner's COMPLETE bytes — never a
  *     torn, empty, or loser's record;
  *  3. a false return preserves existing content and leaves no temp
  *     debris in the log directory.
  *
  * Throws `AssertionError` with the violated law on failure. The
  * shipped stores pass (CommitStoreSpec runs this same harness); a
  * store that passes here is safe for DeltaLite's optimistic
  * concurrency on its target filesystem.
  */
object CommitStoreContract {

  def verify(store: CommitStore, dir: String, threads: Int = 16,
      rounds: Int = 3): Unit = {
    val fs = new Path(dir).getFileSystem(new Configuration())
    def readAll(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    (0 until rounds).foreach { round =>
      val fin = new Path(dir, s"contract-$round.json")
      val payloads = (0 until threads)
        .map(i => s"""{"writer":$i,"round":$round,"pad":"${"x" * 256}"}""")
      val start = new java.util.concurrent.CountDownLatch(1)
      val winners = java.util.Collections.newSetFromMap(
        new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Boolean]())
      val pool = (0 until threads).map { i =>
        val th = new Thread(() => {
          start.await()
          if (store.putIfAbsent(fin, payloads(i).getBytes("UTF-8")))
            winners.add(i)
        })
        th.start(); th
      }
      start.countDown()
      pool.foreach(_.join())
      // law 1: exactly one winner
      if (winners.size != 1) throw new AssertionError(
        s"law 1 violated: ${winners.size} writers won round $round " +
          "(must be exactly 1)")
      val winner = winners.iterator().next()
      // law 2: complete winner bytes
      val got = readAll(fin)
      if (got != payloads(winner)) throw new AssertionError(
        s"law 2 violated: destination holds ${got.take(60)}… not the " +
          s"winner's complete record")
      // law 3a: a late put returns false and preserves content
      if (store.putIfAbsent(fin, "late".getBytes("UTF-8")))
        throw new AssertionError(
          "law 3 violated: putIfAbsent won on an existing destination")
      if (readAll(fin) != payloads(winner)) throw new AssertionError(
        "law 3 violated: a losing put changed existing content")
    }
    // law 3b: losers left no temp debris behind
    val debris = fs.listStatus(new Path(dir)).toSeq
      .map(_.getPath.getName)
      .filterNot(n => n.matches("contract-\\d+\\.json") || n.endsWith(".crc"))
    if (debris.nonEmpty) throw new AssertionError(
      s"law 3 violated: losers left temp debris: $debris")
  }

  // ---- the RETRY LAW, executable (object-store-backed stores) ----

  /** Client wrapper injecting the ambiguous-timeout fault: the FIRST
    * put for each key runs `effect` (what actually reaches the store
    * during the window) and then throws IOException to the caller —
    * the ack is lost; whether the body landed depends on the case.
    */
  private final class FaultyClient(inner: ObjectStoreClient,
      effect: (String, Array[Byte]) => Unit) extends ObjectStoreClient {
    private val hit = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean =
      if (hit.add(key)) {
        effect(key, bytes)
        throw new java.io.IOException(
          "simulated network timeout after the request body was sent")
      } else inner.putIfNoneMatch(key, bytes)
    override def get(key: String): Option[Array[Byte]] = inner.get(key)
  }

  /** Drive a client-backed store through the AMBIGUOUS-TIMEOUT retry
    * law ([[ObjectStoreClient]] scaladoc): a timeout after the body
    * was sent may mean the put landed. Three executable cases:
    *
    *  1. OWN body landed, ack lost → the store must NOT report false
    *     ("lost the race"): the caller would believe the commit failed
    *     while its record sits in the log, and a retried batch
    *     double-applies at the next version. Compliant: re-GET,
    *     compare bytes, report true — or surface the error.
    *  2. a RIVAL's body landed during the window → the store must NOT
    *     report true (claiming a version another writer owns).
    *  3. NOTHING landed (the send itself failed) → a re-send must be
    *     able to win; reporting false with no object present is the
    *     same blind-retry bug in another coat.
    *
    * A blind-retry implementation fails case 1 (its re-put 412s on its
    * own object). Throws AssertionError naming the retry law.
    */
  def verifyRetryLaw(mkStore: ObjectStoreClient => CommitStore,
      dir: String): Unit = {
    def outcome(store: CommitStore, key: Path,
        bytes: Array[Byte]): Option[Boolean] =
      try Some(store.putIfAbsent(key, bytes))
      catch { case _: java.io.IOException => None }

    // case 1: own body landed before the timeout
    val mine = "{\"writer\":\"me\"}".getBytes("UTF-8")
    val inner1 = new FakeObjectStore
    val store1 = mkStore(new FaultyClient(inner1,
      (k, b) => { inner1.putIfNoneMatch(k, b); () }))
    val k1 = new Path(dir, "retry-own.json")
    outcome(store1, k1, mine) match {
      case Some(false) => throw new AssertionError(
        "retry law violated: an ambiguous timeout whose OWN body landed " +
          "was reported as a lost race — the caller would retry a commit " +
          "that already published; re-GET and compare bytes before " +
          "reporting false")
      case _ => () // true (resolved) or surfaced error: both compliant
    }
    if (!inner1.get(k1.toUri.getPath).exists(java.util.Arrays.equals(_, mine)))
      throw new AssertionError(
        "retry law harness: the injected fault did not land the body")

    // case 2: a rival's body landed during the timeout window
    val rival = "{\"writer\":\"rival\"}".getBytes("UTF-8")
    val inner2 = new FakeObjectStore
    val store2 = mkStore(new FaultyClient(inner2,
      (k, _) => { inner2.putIfNoneMatch(k, rival); () }))
    val k2 = new Path(dir, "retry-rival.json")
    outcome(store2, k2, mine) match {
      case Some(true) => throw new AssertionError(
        "retry law violated: the store claimed a version whose object " +
          "holds a RIVAL's bytes")
      case _ => ()
    }
    if (!inner2.get(k2.toUri.getPath).exists(java.util.Arrays.equals(_, rival)))
      throw new AssertionError(
        "retry law harness: the rival body did not survive")

    // case 3: nothing landed — a transient failure before the send
    val inner3 = new FakeObjectStore
    val store3 = mkStore(new FaultyClient(inner3, (_, _) => ()))
    val k3 = new Path(dir, "retry-transient.json")
    outcome(store3, k3, mine) match {
      case Some(false) => throw new AssertionError(
        "retry law violated: reported a lost race with NO object present " +
          "— a transient send failure must be retried or surfaced")
      case Some(true) =>
        if (!inner3.get(k3.toUri.getPath).exists(
            java.util.Arrays.equals(_, mine)))
          throw new AssertionError(
            "retry law violated: claimed success but the object is absent " +
              "or holds other bytes")
      case None => () // surfaced: compliant
    }
  }
}
