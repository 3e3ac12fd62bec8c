package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BinaryDot, ConcatExcludingPositions, DoubleDot,
  GreedyChunkIndices, PackInt8, SortedIntersectCount, TopKPairs}

/** SparkSessionExtensions entry point: registers the native graft
  * expressions for SQL, the graft TABLE functions (whole-table
  * curation operators — see [[graft.sql.GraftSqlFunctions]]), and the
  * graft optimizer rules, on any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`):
  *
  *   SELECT graft_dot(a, b)                  -- codegen'd dot product
  *   SELECT graft_sorted_intersect(a, b)     -- merge-walk |a ∩ b|
  *   SELECT graft_topk(score, id, 10)        -- bounded top-k aggregate
  *   SELECT graft_pack_int8(xs)              -- int8 longs → binary
  *   SELECT graft_binary_dot(p, q)           -- signed-byte dot of packed vecs
  *   SELECT graft_concat_excluding(toks, rm) -- rebuild minus sorted positions
  *   SELECT graft_greedy_chunks(ws, 512)     -- first-fit chunk index per item
  *
  *   SELECT * FROM graft_gopher_gate('docs', 'doc_id', 'text')
  *   SELECT * FROM graft_exact_dedup('docs', 'doc_id', 'text')
  *   ... (the six table functions; GraftSqlFunctions has the list)
  *
  * plus `LevenshteinPrefilterRule` (length guard in front of bounded
  * edit-distance predicates). The analyzer wraps the returned
  * AggregateFunction in an AggregateExpression automatically, so
  * graft_topk composes with GROUP BY / FILTER like a builtin. For a
  * session built WITHOUT extensions, `graft.sql.GraftSql.register`
  * installs the same surface imperatively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilterRule)
    GraftExtensions.scalarFunctions.foreach(e.injectFunction)
    graft.sql.GraftSqlFunctions.tableFunctions.foreach(e.injectTableFunction)
  }
}

object GraftExtensions {
  type ScalarFn =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** The scalar/aggregate graft SQL functions — shared between the
    * extensions injector above and `GraftSql.register`'s imperative
    * path.
    */
  val scalarFunctions: Seq[ScalarFn] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DoubleDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_dot(a, b) takes 2 arguments, got ${exprs.length}")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        DoubleDot(Cast(exprs.head, ArrayType(DoubleType)),
                  Cast(exprs(1), ArrayType(DoubleType)))
      }),
    (FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, null,
        "graft_sorted_intersect",
        "graft_sorted_intersect(a, b) - Intersection size of two array<bigint> " +
        "that MUST be sorted ascending and duplicate-free " +
        "(e.g. array_sort(array_distinct(x))); null elements are skipped.", ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_sorted_intersect(a, b) takes 2 arguments, got ${exprs.length}")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, LongType}
        SortedIntersectCount(Cast(exprs.head, ArrayType(LongType)),
                             Cast(exprs(1), ArrayType(LongType)))
      }),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"graft_topk(score, id, k) takes 3 arguments, got ${exprs.length}")
        require(exprs(2).foldable, "graft_topk k must be a literal")
        val k = exprs(2).eval().asInstanceOf[Number].intValue()
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{DoubleType, LongType}
        TopKPairs(Cast(exprs.head, DoubleType), Cast(exprs(1), LongType), k)
      }),
    (FunctionIdentifier("graft_pack_int8"),
      new ExpressionInfo(classOf[PackInt8].getName, "graft_pack_int8"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_pack_int8(xs) takes 1 argument, got ${exprs.length}")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, LongType}
        PackInt8(Cast(exprs.head, ArrayType(LongType)))
      }),
    (FunctionIdentifier("graft_binary_dot"),
      new ExpressionInfo(classOf[BinaryDot].getName, "graft_binary_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_binary_dot(p, q) takes 2 arguments, got ${exprs.length}")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.BinaryType
        BinaryDot(Cast(exprs.head, BinaryType), Cast(exprs(1), BinaryType))
      }),
    (FunctionIdentifier("graft_concat_excluding"),
      new ExpressionInfo(classOf[ConcatExcludingPositions].getName, null,
        "graft_concat_excluding",
        "graft_concat_excluding(tokens, positions) - Space-join tokens whose " +
        "0-based positions are NOT in the excluded array, which MUST be " +
        "sorted ascending (e.g. array_sort(x)).", ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_concat_excluding(tokens, positions) takes 2 arguments, got ${exprs.length}")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
        ConcatExcludingPositions(Cast(exprs.head, ArrayType(StringType)),
          Cast(exprs(1), ArrayType(IntegerType)))
      }),
    (FunctionIdentifier("graft_greedy_chunks"),
      new ExpressionInfo(classOf[GreedyChunkIndices].getName, "graft_greedy_chunks"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_greedy_chunks(weights, budget) takes 2 arguments, got ${exprs.length}")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, LongType}
        GreedyChunkIndices(Cast(exprs.head, ArrayType(LongType)),
          Cast(exprs(1), LongType))
      }))
}
