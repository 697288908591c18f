package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native generators for the exact-substring dedup family's hot loops.
  *
  * These replace higher-order-function formulations
  * (`explode(array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(toks, i, k)))))` and `explode(flatten(transform(__ids, (x, i) ->
  * transform(slice(...), ...))))`) that Catalyst evaluates INTERPRETED —
  * per element, `slice` copies a k-token array and the lambda re-boxes —
  * and that additionally materialize the full per-row result array before
  * the explode. A generator emits the same rows from a tight loop with no
  * intermediate arrays. The measured pattern is the repo's extension
  * ladder (see [[DotProduct]], [[NearestCentroids]]): >~100 interpreted
  * lambda terms per row → write the kernel. */
object SubstringGenerators {

  private val Space = UTF8String.fromString(" ")

  /** Stride-1 k-token window strings of a token array: one output row per
    * window, `concat_ws(" ", toks[i..i+k-1])` exactly (byte-identical to
    * the column formulation — UTF8String concat over the same tokens).
    * `distinct = true` keeps first occurrences only (the set semantics of
    * `array_distinct`); `withPos` adds the 1-based window position (the
    * positioned-window frame needs every occurrence, so the two flags are
    * never combined by callers). Docs shorter than k tokens emit nothing. */
  case class WordShingleWindows(
      child: Expression, k: Int, distinct: Boolean, withPos: Boolean)
    extends Generator with CodegenFallback with UnaryLike[Expression] {

    require(k >= 2, s"shingle window must be at least 2 tokens, got $k")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingle_windows expects array<string>, got $other")
    }

    override def elementSchema: StructType =
      if (withPos)
        StructType(Seq(StructField("pos", IntegerType, nullable = false),
          StructField("g", StringType, nullable = false)))
      else StructType(Seq(StructField("g", StringType, nullable = false)))

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val toks = child.eval(input).asInstanceOf[ArrayData]
      if (toks == null) return Iterator.empty
      val n = toks.numElements()
      if (n < k) return Iterator.empty
      val parts = new Array[UTF8String](k)
      val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n - k + 1)
      var i = 0
      while (i <= n - k) {
        var j = 0
        while (j < k) {
          // null-skip like concat_ws (and the ShingleKernels twin): an
          // UnsafeArrayData accessor on a null slot returns undefined
          // bytes, so the isNullAt guard is correctness, not style —
          // checkInputDataTypes accepts containsNull=true inputs
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        val g = UTF8String.concatWs(Space, parts: _*)
        if (seen == null || seen.add(g))
          out += (if (withPos) new GenericInternalRow(Array[Any](i + 1, g))
            else new GenericInternalRow(Array[Any](g)))
        i += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Upper-triangle pairs of an array: one row `(a, b)` per i < j over the
    * input's order — exactly the
    * `flatten(transform(arr, (x, i) -> transform(slice(arr, i + 2, ...),
    * y -> (x, y))))` formulation without the per-element slice copies.
    * Works for any element type (ids or occurrence structs). */
  case class ArrayPairs(child: Expression)
    extends Generator with CodegenFallback with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: ArrayType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"array_pairs expects an array, got $other")
    }

    private lazy val elemType =
      child.dataType.asInstanceOf[ArrayType].elementType
    private lazy val elemNullable =
      child.dataType.asInstanceOf[ArrayType].containsNull

    override def elementSchema: StructType =
      StructType(Seq(StructField("a", elemType, elemNullable),
        StructField("b", elemType, elemNullable)))

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val arr = child.eval(input).asInstanceOf[ArrayData]
      if (arr == null) return Iterator.empty
      val n = arr.numElements()
      if (n < 2) return Iterator.empty
      val elems = arr.toObjectArray(elemType)
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          val r = new GenericInternalRow(Array[Any](elems(i), elems(j)))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          r
        }
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Cross-product pairs of two arrays: one row `(a, b)` per element of
    * `left` × element of `right` — the cross-corpus match explode without
    * the nested interpreted transforms. */
  case class ArrayCrossPairs(left: Expression, right: Expression)
    extends Generator with CodegenFallback with BinaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (_: ArrayType, _: ArrayType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"array_cross_pairs expects two arrays, got $l and $r")
      }

    private lazy val lType = left.dataType.asInstanceOf[ArrayType]
    private lazy val rType = right.dataType.asInstanceOf[ArrayType]

    override def elementSchema: StructType =
      StructType(Seq(StructField("a", lType.elementType, lType.containsNull),
        StructField("b", rType.elementType, rType.containsNull)))

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val la = left.eval(input).asInstanceOf[ArrayData]
      val ra = right.eval(input).asInstanceOf[ArrayData]
      if (la == null || ra == null) return Iterator.empty
      val n = la.numElements()
      val m = ra.numElements()
      if (n == 0 || m == 0) return Iterator.empty
      val ls = la.toObjectArray(lType.elementType)
      val rs = ra.toObjectArray(rType.elementType)
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 0
        override def hasNext: Boolean = i < n
        override def next(): InternalRow = {
          val r = new GenericInternalRow(Array[Any](ls(i), rs(j)))
          j += 1
          if (j >= m) { i += 1; j = 0 }
          r
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** xxhash64 with an explicit seed (the `xxhash64()` function pins seed
    * 42, and chaining a constant column does NOT give an independent
    * hash — XxHash64 over multiple columns feeds each hash into the next,
    * so the "second" value would be a pure function of the first). Two
    * independently-seeded halves give the substring family a 128-bit
    * window key over two PRIMITIVE long agg/join columns — measured ~35%
    * faster end-to-end than the md5 hex string key at sf0.1, and 4×
    * smaller in the exchange. */
  def xxhash64Seeded(c: Column, seed: Long): Column =
    GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(GraftSqlBridge.expression(c)), seed))

  def wordShingleWindows(toks: Column, k: Int): Column =
    GraftSqlBridge.column(WordShingleWindows(
      GraftSqlBridge.expression(toks), k, distinct = true, withPos = false))

  def positionedShingleWindows(toks: Column, k: Int): Column =
    GraftSqlBridge.column(WordShingleWindows(
      GraftSqlBridge.expression(toks), k, distinct = false, withPos = true))

  def arrayPairs(arr: Column): Column =
    GraftSqlBridge.column(ArrayPairs(GraftSqlBridge.expression(arr)))

  def arrayCrossPairs(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayCrossPairs(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
