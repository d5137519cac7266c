package graft

/** Model-walk shard B (seeds 1010-1919): column drops, row-level
  * updates, type widening, CDC sidecars, vacuum and fsck. See
  * [[DeltaLiteModelWalks]] — sharded only for forked-JVM parallelism.
  */
class DeltaLiteModelWalksBSpec extends DeltaLiteModelWalks {
  test("random operation walk with column drops: tenth seed") {
    runWalk(seed = 1010, steps = 30, nOps = 16)
  }

  test("random operation walk with column drops: eleventh seed") {
    runWalk(seed = 1111, steps = 30, nOps = 16)
  }

  test("random operation walk with row-level updates: twelfth seed") {
    runWalk(seed = 1212, steps = 30, nOps = 17)
  }

  test("random operation walk with row-level updates: thirteenth seed") {
    runWalk(seed = 1313, steps = 30, nOps = 17)
  }

  test("random operation walk with type widening: fourteenth seed") {
    runWalk(seed = 1414, steps = 30, nOps = 18)
  }

  test("random operation walk with type widening: fifteenth seed") {
    runWalk(seed = 1515, steps = 30, nOps = 18)
  }

  test("random operation walk with CDC sidecars: sixteenth seed") {
    runWalk(seed = 1616, steps = 30, nOps = 19)
  }

  test("random operation walk with CDC sidecars: seventeenth seed") {
    runWalk(seed = 1717, steps = 30, nOps = 19)
  }

  test("random operation walk with vacuum and fsck: eighteenth seed") {
    runWalk(seed = 1818, steps = 30, nOps = 21)
  }

  test("random operation walk with vacuum and fsck: nineteenth seed") {
    runWalk(seed = 1919, steps = 30, nOps = 21)
  }
}
