package graft.meta.diff

import scala.collection.mutable

/** Column-position cascade planner (§2.6 of SURVEY.md).
  *
  * Given validated `after:` moves, emits the full ordered set of
  * position changes including knock-on moves, labeled direct/cascade
  * (reference: src/rules/column_position_manager.py:9-129). Graphs are
  * bounded by column count, so plain driver-side Scala.
  */
object PositionPlanner {

  final case class PositionChange(name: String, after: Option[String], reason: String)

  final class Planner(positions: Map[String, Option[String]]) {
    // column -> after_column, mutated as requested moves are applied
    private val dependencies = mutable.LinkedHashMap.from(positions)
    // after_column -> columns declared after it (insertion-ordered)
    private val reverse = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    positions.foreach { case (column, afterOpt) =>
      afterOpt.foreach { a =>
        reverse.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += column
      }
    }

    /** DFS over reverse deps: the moved column + everything whose
      * declared position chains off it.
      */
    def affectedColumns(changed: String): Set[String] = {
      val affected = mutable.LinkedHashSet.empty[String]
      def walk(col: String): Unit =
        if (affected.add(col))
          reverse.getOrElse(col, Nil).foreach(walk)
      walk(changed)
      affected.toSet
    }

    /** Kahn's topological sort restricted to the affected subgraph. */
    def topologicalSort(affected: Set[String]): Seq[String] = {
      val subgraph = mutable.Map.empty[String, mutable.ArrayBuffer[String]]
      val inDegree = mutable.LinkedHashMap.from(affected.toSeq.map(_ -> 0))
      affected.foreach { col =>
        dependencies.getOrElse(col, None).foreach { afterCol =>
          if (affected.contains(afterCol)) {
            subgraph.getOrElseUpdate(afterCol, mutable.ArrayBuffer.empty) += col
            inDegree(col) += 1
          }
        }
      }
      val queue = mutable.Queue.from(inDegree.collect { case (c, 0) => c })
      val result = mutable.ArrayBuffer.empty[String]
      while (queue.nonEmpty) {
        val col = queue.dequeue()
        result += col
        subgraph.getOrElse(col, Nil).foreach { dep =>
          inDegree(dep) -= 1
          if (inDegree(dep) == 0) queue.enqueue(dep)
        }
      }
      result.toSeq
    }

    /** Emit ordered direct/cascade changes for the requested moves. */
    def generate(changes: Seq[(String, Option[String])]): Seq[PositionChange] = {
      val all = mutable.ArrayBuffer.empty[PositionChange]
      val processed = mutable.Set.empty[String]
      changes.foreach { case (changedColumn, newAfter) =>
        if (!processed.contains(changedColumn)) {
          val affected = affectedColumns(changedColumn)
          dependencies(changedColumn) = newAfter
          topologicalSort(affected).foreach { col =>
            if (!processed.contains(col)) {
              all += PositionChange(
                col,
                dependencies.getOrElse(col, None),
                if (col == changedColumn) "direct" else "cascade")
              processed += col
            }
          }
        }
      }
      all.toSeq
    }
  }

  def apply(positions: Seq[(String, Option[String])]): Planner =
    new Planner(positions.toMap)
}
