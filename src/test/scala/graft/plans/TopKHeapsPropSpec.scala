package graft.plans

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the bounded-heap kernel against the obvious
  * sort-and-take reference, over random keyed datasets — including
  * the merge path (partition → partial prune → merged prune), which
  * must equal pruning the whole dataset at once (the invariant the
  * partial/final exec split relies on).
  */
object TopKHeapsPropSpec extends Properties("TopKHeaps") {

  private val rowGen = for {
    key <- Gen.choose(0, 5)
    v <- Gen.choose(-100, 100)
    id <- Gen.choose(0L, 1000L)
  } yield (key, v, id)

  private def naiveTopK(rows: Seq[(Int, Int, Long)], k: Int) =
    rows.groupBy(_._1).view.mapValues(
      _.sortBy(r => (r._2, r._3)).take(k).toSet).toMap

  private def heapTopK(rows: Seq[(Int, Int, Long)], k: Int) = {
    // same pruning logic as TopKHeaps, on plain tuples
    val ord = Ordering.by[(Int, Int, Long), (Int, Long)](r => (r._2, r._3))
    rows.groupBy(_._1).view.mapValues { rs =>
      val heap = new java.util.PriorityQueue[(Int, Int, Long)](ord.reverse)
      rs.foreach { r =>
        if (heap.size < k) heap.offer(r)
        else if (ord.compare(r, heap.peek()) < 0) { heap.poll(); heap.offer(r) }
      }
      import scala.jdk.CollectionConverters._
      heap.iterator().asScala.toSet
    }.toMap
  }

  property("bounded-heap pruning equals sort-and-take per key") =
    Prop.forAll(Gen.listOf(rowGen), Gen.choose(1, 4)) { (rows, k) =>
      heapTopK(rows, k) == naiveTopK(rows, k)
    }

  property("partial-then-merge pruning equals single-pass pruning") =
    Prop.forAll(Gen.listOf(rowGen), Gen.choose(1, 4), Gen.choose(1, 5)) {
      (rows, k, nPartitions) =>
        val partials = rows.grouped(math.max(1, rows.size / nPartitions + 1))
          .flatMap(part => heapTopK(part, k).values.flatten).toSeq
        heapTopK(partials, k) == heapTopK(rows, k)
    }
}
