package graft

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.etl.{CommitStore, EtagCommitStore, FakeObjectStore, LinkCommitStore, RenameCommitStore}

/** The CommitStore contract ([[graft.etl.CommitStore]] scaladoc),
  * driven on both shipped impls: (1) of N concurrent putIfAbsent
  * callers exactly one returns true; (2) the destination holds the
  * COMPLETE bytes of exactly one caller; (3) losers leave no temp
  * debris. The cross-PROCESS half of the link store's claim is proven
  * separately by [[CrossProcessOccSpec]] with two real JVMs.
  */
class CommitStoreSpec extends SparkSpec {

  private def hadoopFs(dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def raceOnce(store: CommitStore, fin: Path, threads: Int): Unit = {
    val payloads = (0 until threads)
      .map(i => s"""{"writer":$i,"body":"${"x" * 256}"}""")
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
    val pool = (0 until threads).map { i =>
      val th = new Thread(() => {
        start.await()
        results.put(i,
          store.putIfAbsent(fin, payloads(i).getBytes("UTF-8")))
      })
      th.start(); th
    }
    start.countDown()
    pool.foreach(_.join())
    val winners = results.entrySet().iterator()
    var won = List.empty[Int]
    while (winners.hasNext) {
      val e = winners.next()
      if (e.getValue) won ::= e.getKey
    }
    assert(won.size == 1, s"expected exactly one winner, got $won")
    val fs = hadoopFs(fin.getParent.toString)
    val in = fs.open(fin)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      var r = in.read(tmp)
      while (r >= 0) { buf.write(tmp, 0, r); r = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
    assert(new String(bytes, "UTF-8") == payloads(won.head),
      "destination must hold the winner's complete bytes")
  }

  private def assertNoDebris(dir: String, expectFiles: Int): Unit = {
    val files = new java.io.File(dir).listFiles().toSeq
      .map(_.getName).filterNot(_.endsWith(".crc"))
    assert(files.size == expectFiles,
      s"losers must clean their temp files; saw $files")
  }

  test("LinkCommitStore: 32 racing writers, one winner, full bytes, no debris") {
    val dir = java.nio.file.Files.createTempDirectory("cstore-link").toString
    val store = new LinkCommitStore
    (0 until 5).foreach { round =>
      raceOnce(store, new Path(dir, s"$round.json"), threads = 32)
    }
    assertNoDebris(dir, expectFiles = 5)
  }

  test("RenameCommitStore: 32 racing writers, one winner, full bytes, no debris") {
    val dir = java.nio.file.Files.createTempDirectory("cstore-ren").toString
    val store = new RenameCommitStore(hadoopFs(dir))
    (0 until 5).foreach { round =>
      raceOnce(store, new Path(dir, s"$round.json"), threads = 32)
    }
    assertNoDebris(dir, expectFiles = 5)
  }

  test("EtagCommitStore: 32 racing writers through the conditional put, one winner, full bytes, no debris") {
    val dir = java.nio.file.Files.createTempDirectory("cstore-etag").toString
    val store = new EtagCommitStore(new FakeObjectStore)
    (0 until 5).foreach { round =>
      raceOnce(store, new Path(dir, s"$round.json"), threads = 32)
    }
    assertNoDebris(dir, expectFiles = 5)
  }

  test("EtagCommitStore is a worked S3-class example: DeltaLite OCC appends are exactly-once through it") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cstore-etag-dl").toString
    val fake = new FakeObjectStore // ONE store = one bucket's metadata
    def table() = new graft.etl.DeltaLite(spark, root, Some("k")) {
      override protected lazy val commitStore: CommitStore =
        new EtagCommitStore(fake)
    }
    val nThreads = 4; val perThread = 5
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    (0 until nThreads).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            val t = table()
            (0 until perThread).foreach { i =>
              val k = (w * perThread + i).toLong
              t.append(Seq((k, s"w$w-$i")).toDF("k", "v"))
            }
          } catch { case e: Throwable => errs.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120,
      java.util.concurrent.TimeUnit.SECONDS), "writers timed out")
    assert(errs.isEmpty, s"no append may fail: ${Option(errs.peek())}")
    val t = table()
    // contiguous versions (no lost or double commit) and every row once
    assert(t.latestVersion.contains(nThreads * perThread - 1))
    val ks = t.read().select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == (0L until (nThreads * perThread).toLong))
  }

  test("putIfAbsent on an existing destination returns false and preserves content") {
    val dir = java.nio.file.Files.createTempDirectory("cstore-exist").toString
    Seq(new LinkCommitStore,
        new EtagCommitStore(new FakeObjectStore),
        new RenameCommitStore(hadoopFs(dir))).zipWithIndex.foreach {
      case (store, i) =>
        val fin = new Path(dir, s"only-$i.json")
        assert(store.putIfAbsent(fin, "first".getBytes("UTF-8")))
        assert(!store.putIfAbsent(fin, "second".getBytes("UTF-8")))
        val src = scala.io.Source.fromFile(new java.io.File(dir, s"only-$i.json"))
        try assert(src.mkString == "first") finally src.close()
    }
  }

  test("forFs resolves the link store for file:// (the cross-process-safe local impl)") {
    val fs = hadoopFs(java.nio.file.Files.createTempDirectory("cstore-fs").toString)
    assert(CommitStore.forFs(fs).isInstanceOf[LinkCommitStore])
  }

  test("the public CommitStoreContract harness passes on all three shipped stores and names a violated law") {
    val d1 = java.nio.file.Files.createTempDirectory("cstore-c1").toString
    graft.etl.CommitStoreContract.verify(new LinkCommitStore, d1)
    val d2 = java.nio.file.Files.createTempDirectory("cstore-c2").toString
    graft.etl.CommitStoreContract.verify(new RenameCommitStore(hadoopFs(d2)), d2)
    val d4 = java.nio.file.Files.createTempDirectory("cstore-c4").toString
    graft.etl.CommitStoreContract.verify(
      new EtagCommitStore(new FakeObjectStore), d4)
    // a blind-overwrite "store" (what raw S3 PUT or POSIX rename would
    // do) must be REJECTED by the contract, naming the law
    val broken = new CommitStore {
      override def putIfAbsent(fin: org.apache.hadoop.fs.Path,
          bytes: Array[Byte]): Boolean = {
        val p = java.nio.file.Paths.get(fin.toUri.getPath)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, bytes) // last writer wins — unsafe
        true
      }
    }
    val d3 = java.nio.file.Files.createTempDirectory("cstore-c3").toString
    val e = intercept[AssertionError](
      graft.etl.CommitStoreContract.verify(broken, d3))
    assert(e.getMessage.contains("law 1"))
  }

  test("the retry law is executable: EtagCommitStore resolves ambiguous timeouts, a blind-retry impl is rejected") {
    import graft.etl.ObjectStoreClient
    // the shipped store resolves all three fault cases (own-body
    // landed → true via re-GET+compare; rival landed → false; nothing
    // landed → bounded re-send)
    val d1 = java.nio.file.Files.createTempDirectory("cstore-retry1").toString
    graft.etl.CommitStoreContract.verifyRetryLaw(new EtagCommitStore(_), d1)
    // the subtly-wrong production client: on timeout, blindly re-PUT.
    // Its own object 412s the retry and it reports a false "lost the
    // race" — exactly the bug the law names; the harness must reject
    // it, not pass it
    def blindRetry(client: ObjectStoreClient): CommitStore = new CommitStore {
      override def putIfAbsent(fin: org.apache.hadoop.fs.Path,
          bytes: Array[Byte]): Boolean = {
        val key = fin.toUri.getPath
        try client.putIfNoneMatch(key, bytes)
        catch {
          case _: java.io.IOException => client.putIfNoneMatch(key, bytes)
        }
      }
    }
    val d2 = java.nio.file.Files.createTempDirectory("cstore-retry2").toString
    val e = intercept[AssertionError](
      graft.etl.CommitStoreContract.verifyRetryLaw(blindRetry, d2))
    assert(e.getMessage.contains("retry law"))
    assert(e.getMessage.contains("OWN body landed"))
  }
}
