package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** TrainMemo publish semantics, pure-JVM (no Spark session): the memo
  * keys are strings and the values opaque AnyRefs, so the retirement
  * contract is testable directly.
  *
  * The scenario under test is the incremental-crawl loop's normal
  * life: publish keys embed the fixture CONTENT snapshot
  * (`<root>@<md5>`, TrainMemo.snapshotOf), so when the fixture mutates
  * the next publish lands under a NEW key — and before the
  * stale-snapshot sweep, the old entry stayed pinned forever (exempt
  * from cap eviction, unreachable via memoKeyOf, referenced by the
  * map so GC could never reclaim its localCheckpoint blocks). */
class TrainMemoSpec extends AnyFunSuite {

  private def md5ish(seed: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def key(session: String, root: String, contentSeed: String) =
    s"bandidx:$session:$root@${md5ish(contentSeed)}"

  test("publish retires prior publications of the same artifact under a stale fixture snapshot") {
    TrainMemo.clear()
    val k1 = key("sessA", "file:/fixtures/docs", "v1")
    val k2 = key("sessA", "file:/fixtures/docs", "v2")
    val v1 = new Object; val v2 = new Object

    TrainMemo.publish(k1, v1)
    assert(TrainMemo.get[Object](k1).contains(v1))

    // fixture mutated (new content hash) → new key supersedes the old
    TrainMemo.publish(k2, v2)
    assert(TrainMemo.get[Object](k2).contains(v2))
    assert(TrainMemo.get[Object](k1).isEmpty,
      "stale-snapshot publication must be dereferenced on supersession")
    assert(TrainMemo.publishedCount == 1)
    TrainMemo.clear()
  }

  test("publish keeps publications for other fixtures, sessions, and kinds") {
    TrainMemo.clear()
    val base = key("sessA", "file:/fixtures/docs", "v1")
    val otherRoot = key("sessA", "file:/fixtures/other", "v1")
    val otherSession = key("sessB", "file:/fixtures/docs", "v1")
    val otherKind = s"idx2:sessA:file:/fixtures/docs@${md5ish("v1")}"
    Seq(base, otherRoot, otherSession, otherKind)
      .foreach(k => TrainMemo.publish(k, new Object))
    assert(TrainMemo.publishedCount == 4)

    // superseding `base` must touch nothing else
    TrainMemo.publish(key("sessA", "file:/fixtures/docs", "v2"), new Object)
    assert(TrainMemo.publishedCount == 4)
    assert(TrainMemo.get[Object](base).isEmpty)
    Seq(otherRoot, otherSession, otherKind)
      .foreach(k => assert(TrainMemo.get[Object](k).nonEmpty, s"$k must survive"))
    TrainMemo.clear()
  }

  test("re-publish under the SAME key replaces in place without retiring") {
    TrainMemo.clear()
    val k = key("sessA", "file:/fixtures/docs", "v1")
    val v1 = new Object; val v2 = new Object
    TrainMemo.publish(k, v1)
    TrainMemo.publish(k, v2)
    assert(TrainMemo.get[Object](k).contains(v2))
    assert(TrainMemo.publishedCount == 1)
    TrainMemo.clear()
  }

  test("multi-root keys (joined snapshots) retire only on matching root sets") {
    TrainMemo.clear()
    val two1 = s"pairidx:sessA:file:/a@${md5ish("a1")},file:/b@${md5ish("b1")}"
    val two2 = s"pairidx:sessA:file:/a@${md5ish("a2")},file:/b@${md5ish("b2")}"
    val one = s"pairidx:sessA:file:/a@${md5ish("a1")}"
    TrainMemo.publish(two1, new Object)
    TrainMemo.publish(one, new Object)
    TrainMemo.publish(two2, new Object) // supersedes two1, not one
    assert(TrainMemo.get[Object](two1).isEmpty)
    assert(TrainMemo.get[Object](one).nonEmpty)
    assert(TrainMemo.get[Object](two2).nonEmpty)
    TrainMemo.clear()
  }
}
