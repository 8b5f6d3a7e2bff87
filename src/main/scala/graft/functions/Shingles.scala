package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator (the Scala UDTF surface): streams word n-gram shingles
  * from a text column WITHOUT materializing the shingle array per row
  * — the composable formulation (`explode(transform(sequence(...)))`)
  * allocates every shingle of a document at once before the explode;
  * this generator yields them one at a time, so peak memory per row is
  * one shingle regardless of document length (the difference between
  * OOM and not on book-length documents).
  *
  * SQL: `graft_shingles(text, n)` (via [[graft.GraftExtensions]]).
  */
final case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n > 0, "shingle width must be positive")

  override def elementSchema: StructType =
    StructType(StructField("sh", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input).asInstanceOf[UTF8String]
    if (text == null) Iterator.empty
    else {
      val words = text.toString.split(" ", -1)
      if (words.length < n) Iterator.empty
      else (0 to words.length - n).iterator.map { i =>
        InternalRow(UTF8String.fromString(words.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
