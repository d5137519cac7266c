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
}
