package graft

/** Model-walk shard A (seeds 101-909): the base op mix through
  * clause merges, renames, checkpoints and log retention. The walk
  * harness lives in [[DeltaLiteModelWalks]]; the suite is SHARDED into
  * three classes purely so sbt's test grouping can run them in
  * parallel forked JVMs — the seeds, steps and assertions are
  * unchanged from the single-class suite.
  */
class DeltaLiteModelSpec extends DeltaLiteModelWalks {
  test("random operation walk: table equals the reference model at every step") {
    runWalk(seed = 101, steps = 30)
  }

  test("random operation walk: second seed") {
    // seed 202's walk is the one that exposed the two-commit restore's
    // broken intermediate version (restore now carries DVs atomically)
    runWalk(seed = 202, steps = 30)
  }

  test("random operation walk: third seed") {
    runWalk(seed = 303, steps = 30)
  }

  test("random operation walk with clause merges: fourth seed") {
    runWalk(seed = 404, steps = 30, nOps = 11)
  }

  test("random operation walk with merges and restats: fifth seed") {
    runWalk(seed = 505, steps = 30, nOps = 12)
  }

  test("random operation walk with column renames: sixth seed") {
    runWalk(seed = 606, steps = 30, nOps = 13)
  }

  test("random operation walk with column renames: seventh seed") {
    runWalk(seed = 707, steps = 30, nOps = 13)
  }

  test("random operation walk with checkpoints and log retention: eighth seed") {
    runWalk(seed = 808, steps = 30, nOps = 15)
  }

  test("random operation walk with checkpoints and log retention: ninth seed") {
    runWalk(seed = 909, steps = 30, nOps = 15)
  }
}
