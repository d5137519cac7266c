package graft

/** Model-walk shard C (seeds 2020-2626): legacy json checkpoints,
  * sidecar-backed logs, alias swaps and clustered OPTIMIZE. See
  * [[DeltaLiteModelWalks]] — sharded only for forked-JVM parallelism.
  */
class DeltaLiteModelWalksCSpec extends DeltaLiteModelWalks {
  // the default-format seeds (shards A/B) exercise the v2 parquet
  // checkpoints on every checkpointNow/cleanLog step; this seed pins the LEGACY
  // single-blob codec through the same full walk so the back-compat
  // read path keeps model-level coverage, not just the one round-trip
  // test in DeltaLiteCheckpointSpec
  test("random operation walk with legacy json checkpoints: twentieth seed") {
    runWalk(seed = 2020, steps = 30, nOps = 15, ckptFormat = "json")
  }

  // sidecarAt = 1 forces EVERY data-bearing record through the parquet
  // sidecar codec (files, removes, DVs as lazy parquet rows) — the
  // full walk then exercises replay, time travel, restore, compaction,
  // DV interplay, checkpoints and cleanLog over sidecar-backed logs,
  // the same way seed 2020 pins the legacy-json codec
  test("random operation walk with sidecar-backed commit records: twenty-first seed") {
    runWalk(seed = 2121, steps = 30, nOps = 17, sidecarAt = 1)
  }

  test("random operation walk with sidecar records and restats: twenty-second seed") {
    runWalk(seed = 2222, steps = 30, nOps = 15, sidecarAt = 1)
  }

  // nOps = 23 arms the alias-swap op (key/value column names exchange)
  // and the value-equality delete — the pair that would expose a
  // stale-stats-label re-validation as a model divergence (a wrongly
  // pruned delete leaves its row behind)
  test("random operation walk with alias swaps: twenty-third seed") {
    runWalk(seed = 2323, steps = 30, nOps = 23,
      mustFire = Set("aliasSwap", "deleteByValue"))
  }

  test("random operation walk with alias swaps over sidecar logs: twenty-fourth seed") {
    runWalk(seed = 2424, steps = 45, nOps = 23, sidecarAt = 1,
      mustFire = Set("aliasSwap", "deleteByValue"))
  }

  // nOps = 24 arms incremental clustered OPTIMIZE (layout-only rewrite
  // + cube-props commit) against the full op mix
  test("random operation walk with clustered OPTIMIZE: twenty-fifth seed") {
    runWalk(seed = 2525, steps = 40, nOps = 24,
      mustFire = Set("optimizeClustered", "aliasSwap"))
  }

  test("random operation walk with clustered OPTIMIZE over sidecar logs: twenty-sixth seed") {
    runWalk(seed = 2626, steps = 40, nOps = 24, sidecarAt = 1,
      mustFire = Set("optimizeClustered", "restore", "checkpointNow"))
  }
}
