package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Native Catalyst expressions for the hot paths — preference order
  * (b) from the build plan: a codegen'd `Expression` beats a UDF and
  * composed higher-order functions because it runs inside
  * whole-stage codegen with primitive access, no per-element lambda
  * dispatch and no intermediate array allocation.
  */

/** Dot product of two `array<double>` columns as a tight primitive
  * loop. Fold order is ascending index — identical to
  * `aggregate(zip_with(...))` and DuckDB's `list_sum`, so results are
  * bit-for-bit unchanged from the composed version it replaces.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DoubleDot =
    copy(left = l, right = r)
}

/** Intersection size of two SORTED `array<bigint>` columns as a
  * codegen'd merge walk — no per-call hash set, no intermediate
  * array, primitive access only. Spark's `array_intersect` builds a
  * hash set per invocation; in a similarity join the intersection
  * runs once per candidate PAIR, so the allocation cost multiplies
  * by the pair count. Inputs must be sorted ascending and
  * duplicate-free (`array_sort(array_distinct(...))` — or
  * `array_sort` of already-distinct shingle hashes); the walk skips
  * null element slots rather than reading undefined data (the
  * expression is exposed to arbitrary SQL as
  * `graft_sorted_intersect`, which cannot guarantee non-null
  * elements the way the internal call sites do).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |    if ($xv == $yv) { $c++; $i++; $j++; }
         |    else if ($xv < $yv) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** k-permutation MinHash signature of an `array<long>` shingle-hash
  * column as one tight Java loop — BIT-IDENTICAL to the
  * `aggregate(zip_with(...least(m, xxhash64(i, s))))` fold it
  * replaces (same XXH64 chain: seed 42 → hashInt(permutation index)
  * → hashLong(shingle)), so signatures interoperate with every
  * persisted band index. The fold form runs interpreted and
  * allocates a fresh k-long accumulator array per ELEMENT
  * (O(n·k) allocations); this is k seeds precomputed once and
  * n·k primitive hash evaluations, zero allocation. Empty input →
  * all-MaxValue signature (the fold's init), null slots skipped.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // XXH64 chain prefix: xxhash64(i, s) hashes the INT index into the
  // default seed 42, then the LONG shingle into that.
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => org.apache.spark.sql.catalyst.expressions.XXH64
      .hashInt(i, 42L))

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!a.isNullAt(j)) {
        val s = a.getLong(j)
        var i = 0
        while (i < k) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(s, seeds(i))
          if (h < out(i)) out(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    long $s = $a.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $h = $xxh.hashLong($s, $seedsRef[$i]);
         |      if ($h < $out[$i]) $out[$i] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Universal-hash MinHash signature over STRING shingles as one Java
  * loop: per shingle the 31-base polynomial hash over its UTF-16 code
  * units mod p = 1e9+7 (bit-identical to the
  * `aggregate(transform(split(t, ""), ascii), ...)` fold — `split`
  * emits code units and `ascii` their values), then k affine
  * permutations h_i = (a_i·H + b_i) mod p with a running minimum.
  * The composed-HOF form ran interpreted with per-character lambda
  * dispatch plus a k-long accumulator allocation per shingle.
  */
case class PolyMinHash(child: Expression, k: Int,
                       params: Seq[(Long, Long)]) extends UnaryExpression {

  require(k > 0 && params.length == k)

  val P = 1000000007L

  @transient private lazy val as: Array[Long] = params.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = params.map(_._2).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def polyHash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) { acc = (acc * 31L + str.charAt(i)) % P; i += 1 }
    acc
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = polyHash(arr.getUTF8String(j))
        var i = 0
        while (i < k) {
          val x = (h * as(i) + bs(i)) % P
          if (x < out(i)) out(i) = x
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val asRef = ctx.addReferenceObj("pmhA", as, "long[]")
      val bsRef = ctx.addReferenceObj("pmhB", bs, "long[]")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val str = ctx.freshName("str")
      val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    String $str = $a.getUTF8String($j).toString();
         |    long $acc = 0L;
         |    for (int $c = 0; $c < $str.length(); $c++) {
         |      $acc = ($acc * 31L + $str.charAt($c)) % ${P}L;
         |    }
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $x = ($acc * $asRef[$i] + $bsRef[$i]) % ${P}L;
         |      if ($x < $out[$i]) $out[$i] = $x;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyMinHash =
    copy(child = c)
}

/** Universal-hash MinHash over word n-GRAMS of a token array,
  * without ever materializing the gram strings. Two exact algebraic
  * facts make this bit-identical to
  * `PolyMinHash(array_distinct(ngrams(tokens, n)), k)`:
  *
  *   1. the 31-base polynomial composes over concatenation —
  *      H(a ++ b) = H(a)·31^|b| + H(b) (mod p) — so each gram's hash
  *      is assembled from per-token (hash, 31^length) pairs computed
  *      ONCE, with the joining space contributing `acc·31 + 32`;
  *   2. a minimum is multiplicity-blind, so the `array_distinct` the
  *      string form needs (to bound the per-gram work) changes no
  *      signature component and is simply dropped.
  *
  * The string form walks every character of every OVERLAPPING gram
  * (n× re-walk) after an interpreted slices+zip_with concat built
  * the gram array; this is one pass over the tokens plus O(1) per
  * gram per permutation.
  */
case class PolyMinHashGrams(child: Expression, n: Int, k: Int,
                            params: Seq[(Long, Long)]) extends UnaryExpression {

  require(n > 0 && k > 0 && params.length == k)

  val P = 1000000007L

  @transient private lazy val as: Array[Long] = params.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = params.map(_._2).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val ph = new Array[Long](len)
    val pw = new Array[Long](len)
    val nul = new Array[Boolean](len)
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) nul(i) = true
      else {
        val str = arr.getUTF8String(i).toString
        var acc = 0L; var pow = 1L; var c = 0
        while (c < str.length) {
          acc = (acc * 31L + str.charAt(c)) % P
          pow = (pow * 31L) % P
          c += 1
        }
        ph(i) = acc; pw(i) = pow
      }
      i += 1
    }
    val out = Array.fill(k)(Long.MaxValue)
    val cnt = len - (n - 1)
    i = 0
    while (i < cnt) {
      var ok = true
      var j = 0
      while (j < n) { if (nul(i + j)) ok = false; j += 1 }
      if (ok) {
        var h = ph(i)
        j = 1
        while (j < n) {
          h = (h * 31L + 32L) % P
          h = (h * pw(i + j) + ph(i + j)) % P
          j += 1
        }
        var q = 0
        while (q < k) {
          val x = (h * as(q) + bs(q)) % P
          if (x < out(q)) out(q) = x
          q += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val asRef = ctx.addReferenceObj("pmhgA", as, "long[]")
      val bsRef = ctx.addReferenceObj("pmhgB", bs, "long[]")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val q = ctx.freshName("q"); val c = ctx.freshName("c")
      val len = ctx.freshName("len"); val cnt = ctx.freshName("cnt")
      val ph = ctx.freshName("ph"); val pw = ctx.freshName("pw")
      val nul = ctx.freshName("nul"); val out = ctx.freshName("out")
      val str = ctx.freshName("str"); val acc = ctx.freshName("acc")
      val pow = ctx.freshName("pow"); val h = ctx.freshName("h")
      val ok = ctx.freshName("ok"); val x = ctx.freshName("x")
      s"""
         |int $len = $a.numElements();
         |long[] $ph = new long[$len];
         |long[] $pw = new long[$len];
         |boolean[] $nul = new boolean[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($a.isNullAt($i)) { $nul[$i] = true; }
         |  else {
         |    String $str = $a.getUTF8String($i).toString();
         |    long $acc = 0L; long $pow = 1L;
         |    for (int $c = 0; $c < $str.length(); $c++) {
         |      $acc = ($acc * 31L + $str.charAt($c)) % ${P}L;
         |      $pow = ($pow * 31L) % ${P}L;
         |    }
         |    $ph[$i] = $acc; $pw[$i] = $pow;
         |  }
         |}
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $cnt = $len - ${n - 1};
         |for (int $i = 0; $i < $cnt; $i++) {
         |  boolean $ok = true;
         |  for (int $j = 0; $j < $n; $j++) { if ($nul[$i + $j]) $ok = false; }
         |  if ($ok) {
         |    long $h = $ph[$i];
         |    for (int $j = 1; $j < $n; $j++) {
         |      $h = ($h * 31L + 32L) % ${P}L;
         |      $h = ($h * $pw[$i + $j] + $ph[$i + $j]) % ${P}L;
         |    }
         |    for (int $q = 0; $q < $k; $q++) {
         |      long $x = ($h * $asRef[$q] + $bsRef[$q]) % ${P}L;
         |      if ($x < $out[$q]) $out[$q] = $x;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyMinHashGrams =
    copy(child = c)
}

/** 30-bit SimHash of a token array in one pass — bit-identical to
  * the composed `aggregate(transform(array_distinct(tokens), poly),
  * ±1 bit-vector fold)` form: distinctness is EXACT (a string hash
  * set, matching array_distinct — deduping on the polynomial value
  * instead would merge mod-1e9+7 colliding tokens and flip majority
  * counts), the per-token hash is the same 31-base polynomial over
  * UTF-16 code units, and ±1 bit sums are order-blind. The composed
  * form allocated a 30-long accumulator array per TOKEN under
  * interpreted HOF dispatch.
  */
case class SimHash30(child: Expression) extends UnaryExpression {

  val P = 1000000007L
  val Bits = 30

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](n * 2)
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        if (seen.add(s)) {
          val str = s.toString
          var h = 0L; var c = 0
          while (c < str.length) { h = (h * 31L + str.charAt(c)) % P; c += 1 }
          var k = 0
          while (k < Bits) {
            counts(k) += (if (((h >> k) & 1L) != 0L) 1 else -1)
            k += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < Bits) { if (counts(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val seen = ctx.freshName("seen"); val counts = ctx.freshName("counts")
      val s = ctx.freshName("s"); val str = ctx.freshName("str")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $n = $a.numElements();
         |java.util.HashSet<$u> $seen = new java.util.HashSet<$u>($n * 2);
         |int[] $counts = new int[$Bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $u $s = $a.getUTF8String($i);
         |    if ($seen.add($s)) {
         |      String $str = $s.toString();
         |      long $h = 0L;
         |      for (int $c = 0; $c < $str.length(); $c++) {
         |        $h = ($h * 31L + $str.charAt($c)) % ${P}L;
         |      }
         |      for (int $k = 0; $k < $Bits; $k++) {
         |        $counts[$k] += ((($h >> $k) & 1L) != 0L) ? 1 : -1;
         |      }
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $k = 0; $k < $Bits; $k++) {
         |  if ($counts[$k] > 0) $out |= (1L << $k);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash30 =
    copy(child = c)
}

/** Highest element frequency of an `array<string>` column — the
  * kernel of the Gopher top-n-gram repetition filter: one hash-count
  * pass per row (O(n)), replacing an interpreted sort + run-length
  * fold. Null slots are skipped; empty input → 0.
  */
case class MaxFreq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        val c = counts.merge(s, 1, (x: Integer, y: Integer) => x + y)
        if (c > best) best = c.intValue()
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val counts = ctx.freshName("counts"); val best = ctx.freshName("best")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $n = $a.numElements();
         |java.util.HashMap<$u, Integer> $counts =
         |  new java.util.HashMap<$u, Integer>($n * 2);
         |int $best = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $u $s = $a.getUTF8String($i);
         |    Integer $c = (Integer) $counts.get($s);
         |    $c = ($c == null) ? Integer.valueOf(1) : Integer.valueOf($c.intValue() + 1);
         |    $counts.put($s, $c);
         |    if ($c.intValue() > $best) $best = $c.intValue();
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MaxFreq =
    copy(child = c)
}

/** Highest element frequency of a `array<bigint>` column — the
  * long-keyed sibling of [[MaxFreq]], for callers that count gram
  * HASHES instead of materializing gram strings (equal counts up to
  * the ~2⁻⁶⁴ xxhash64 collision rate, the same accepted trade as
  * `shingleHashes`).
  */
case class MaxFreqLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val counts = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val c = counts.merge(a.getLong(i), 1, (x: Integer, y: Integer) => x + y)
        if (c > best) best = c.intValue()
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val counts = ctx.freshName("counts"); val best = ctx.freshName("best")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |java.util.HashMap<Long, Integer> $counts =
         |  new java.util.HashMap<Long, Integer>($n * 2);
         |int $best = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    Long _k = Long.valueOf($a.getLong($i));
         |    Integer $c = (Integer) $counts.get(_k);
         |    $c = ($c == null) ? Integer.valueOf(1) : Integer.valueOf($c.intValue() + 1);
         |    $counts.put(_k, $c);
         |    if ($c.intValue() > $best) $best = $c.intValue();
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MaxFreqLong =
    copy(child = c)
}

/** Positional n-gram hashes of a token array as one primitive loop:
  * element i is the rolling xxhash64 of tokens [i, i+n) — BIT-
  * IDENTICAL to the `transform(tokens, xxhash64)` + n-way
  * slice/zip_with chain it replaces (per-token `hashUnsafeBytes`
  * seed 42, then left-fold `hashLong(next, hashLong(acc, 42))` —
  * exactly Spark's two-arg `xxhash64`), so every persisted signature
  * and band index built by the composed form keeps matching. The
  * composed form ran n interpreted zip_with passes allocating n−1
  * intermediate arrays per document; this is one pass, one output
  * array, and each token's bytes are hashed once instead of being
  * re-walked per overlapping gram.
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "gram size must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val len = a.numElements()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) =
        if (a.isNullAt(i)) 42L
        else {
          val s = a.getUTF8String(i)
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      i += 1
    }
    val cnt = len - (n - 1)
    if (cnt <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](cnt)
      i = 0
      while (i < cnt) {
        var acc = th(i)
        var j = 1
        while (j < n) {
          acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
            th(i + j),
            org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(acc, 42L))
          j += 1
        }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val len = ctx.freshName("len"); val cnt = ctx.freshName("cnt")
      val th = ctx.freshName("th"); val out = ctx.freshName("out")
      val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $len = $a.numElements();
         |long[] $th = new long[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($a.isNullAt($i)) { $th[$i] = 42L; }
         |  else {
         |    $u $s = $a.getUTF8String($i);
         |    $th[$i] = $xxh.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |}
         |int $cnt = $len - ${n - 1};
         |long[] $out = new long[$cnt > 0 ? $cnt : 0];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  long $acc = $th[$i];
         |  for (int $j = 1; $j < $n; $j++) {
         |    $acc = $xxh.hashLong($th[$i + $j], $xxh.hashLong($acc, 42L));
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): GramHashes =
    copy(child = c)
}

/** Within-document duplicated-gram counts in one pass over the
  * positional gram-hash array: returns
  * `struct(dup_occ, covered)` where `dup_occ` is the number of gram
  * OCCURRENCES whose hash appears ≥ 2 times in the document, and
  * `covered` is the number of token positions lying under at least
  * one such occurrence (each gram at 0-based slot i covers 1-based
  * tokens i+1 .. i+n). Replaces the composed
  * `sort_array + zip_with + transform(array_contains) +
  * filter(sequence, exists(slice))` chain, which ran INTERPRETED
  * (higher-order functions have no codegen) and allocated one slice
  * per token position — O(tokens × n) allocations per row. Here:
  * one sort (O(m log m)), one binary search per gram, and an
  * interval-union walk for coverage — zero per-element allocation,
  * inside whole-stage codegen. Values are identical by construction
  * (same hash array in, same duplicated-set definition).
  */
case class DupGramCounts(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "gram size must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("dup_occ", LongType, nullable = false),
    StructField("covered", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val m = a.numElements()
    var dupOcc = 0L
    var covered = 0L
    if (m > 0) {
      val g = a.toLongArray()
      val srt = java.util.Arrays.copyOf(g, m)
      java.util.Arrays.sort(srt)
      // compact the sorted array down to its duplicated values
      var d = 0
      var i = 0
      while (i < m) {
        var j = i + 1
        while (j < m && srt(j) == srt(i)) j += 1
        if (j - i >= 2) { srt(d) = srt(i); d += 1 }
        i = j
      }
      var lastEnd = 0L
      var k = 0
      while (k < m) {
        if (d > 0 && java.util.Arrays.binarySearch(srt, 0, d, g(k)) >= 0) {
          dupOcc += 1
          val start = k + 1L
          val end = k + n.toLong
          val from = math.max(lastEnd, start - 1)
          if (end > from) covered += end - from
          if (end > lastEnd) lastEnd = end
        }
        k += 1
      }
    }
    InternalRow(dupOcc, covered)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m"); val g = ctx.freshName("g")
      val srt = ctx.freshName("srt"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val dupOcc = ctx.freshName("dupOcc")
      val covered = ctx.freshName("covered"); val lastEnd = ctx.freshName("lastEnd")
      val start = ctx.freshName("start"); val end = ctx.freshName("end")
      val from = ctx.freshName("from")
      s"""
         |int $m = $a.numElements();
         |long $dupOcc = 0L; long $covered = 0L;
         |if ($m > 0) {
         |  long[] $g = $a.toLongArray();
         |  long[] $srt = java.util.Arrays.copyOf($g, $m);
         |  java.util.Arrays.sort($srt);
         |  int $d = 0;
         |  int $i = 0;
         |  while ($i < $m) {
         |    int $j = $i + 1;
         |    while ($j < $m && $srt[$j] == $srt[$i]) $j++;
         |    if ($j - $i >= 2) { $srt[$d] = $srt[$i]; $d++; }
         |    $i = $j;
         |  }
         |  long $lastEnd = 0L;
         |  for (int $k = 0; $k < $m; $k++) {
         |    if ($d > 0 && java.util.Arrays.binarySearch($srt, 0, $d, $g[$k]) >= 0) {
         |      $dupOcc++;
         |      long $start = $k + 1L;
         |      long $end = $k + ${n}L;
         |      long $from = Math.max($lastEnd, $start - 1L);
         |      if ($end > $from) $covered += $end - $from;
         |      if ($end > $lastEnd) $lastEnd = $end;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $dupOcc, $covered });
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): DupGramCounts =
    copy(child = c)
}

/** Winnowing fingerprint selection (Schleimer et al. SIGMOD'03) in
  * one pass: per-token 31-base polynomial hashes (the PolyMinHashGrams
  * composition — gram strings never materialize), k-gram hashes with
  * the ' ' (32) separator, minimum of every `window` consecutive gram
  * hashes, distinct, sorted ascending. Replaces the composed
  * `transform(ngrams, aggregate-poly)` + `transform(sequence,
  * array_min(slice))` form, which was interpreted end-to-end and
  * allocated one window slice per position. Fingerprint VALUES are
  * identical (same polynomial, same window minima; distinct-set
  * equality — the composed form's first-occurrence order is
  * irrelevant because callers explode the set into rows).
  * Documents with fewer than `window` grams emit an empty array,
  * matching the composed form's guard.
  */
case class WinnowMins(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  require(k > 0 && window > 0)

  val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val ph = new Array[Long](len)
    val pw = new Array[Long](len)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val str = arr.getUTF8String(i).toString
        var acc = 0L; var pow = 1L; var c = 0
        while (c < str.length) {
          acc = (acc * 31L + str.charAt(c)) % P
          pow = (pow * 31L) % P
          c += 1
        }
        ph(i) = acc; pw(i) = pow
      }
      i += 1
    }
    val cnt = len - (k - 1)
    if (cnt < window) new GenericArrayData(Array.emptyLongArray)
    else {
      val gh = new Array[Long](cnt)
      i = 0
      while (i < cnt) {
        var h = ph(i)
        var j = 1
        while (j < k) {
          h = (h * 31L + 32L) % P
          h = (h * pw(i + j) + ph(i + j)) % P
          j += 1
        }
        gh(i) = h
        i += 1
      }
      val wins = cnt - window + 1
      val mins = new Array[Long](wins)
      i = 0
      while (i < wins) {
        var mn = gh(i)
        var j = 1
        while (j < window) { if (gh(i + j) < mn) mn = gh(i + j); j += 1 }
        mins(i) = mn
        i += 1
      }
      java.util.Arrays.sort(mins)
      var d = 0
      i = 0
      while (i < wins) {
        if (i == 0 || mins(i) != mins(i - 1)) { mins(d) = mins(i); d += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(mins, d))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len"); val ph = ctx.freshName("ph")
      val pw = ctx.freshName("pw"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val str = ctx.freshName("str"); val acc = ctx.freshName("acc")
      val pow = ctx.freshName("pow"); val cnt = ctx.freshName("cnt")
      val gh = ctx.freshName("gh"); val h = ctx.freshName("h")
      val wins = ctx.freshName("wins"); val mins = ctx.freshName("mins")
      val mn = ctx.freshName("mn"); val d = ctx.freshName("d")
      s"""
         |int $len = $a.numElements();
         |long[] $ph = new long[$len];
         |long[] $pw = new long[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    String $str = $a.getUTF8String($i).toString();
         |    long $acc = 0L; long $pow = 1L;
         |    for (int $c = 0; $c < $str.length(); $c++) {
         |      $acc = ($acc * 31L + $str.charAt($c)) % ${P}L;
         |      $pow = ($pow * 31L) % ${P}L;
         |    }
         |    $ph[$i] = $acc; $pw[$i] = $pow;
         |  }
         |}
         |int $cnt = $len - ${k - 1};
         |if ($cnt < $window) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $gh = new long[$cnt];
         |  for (int $i = 0; $i < $cnt; $i++) {
         |    long $h = $ph[$i];
         |    for (int $j = 1; $j < $k; $j++) {
         |      $h = ($h * 31L + 32L) % ${P}L;
         |      $h = ($h * $pw[$i + $j] + $ph[$i + $j]) % ${P}L;
         |    }
         |    $gh[$i] = $h;
         |  }
         |  int $wins = $cnt - $window + 1;
         |  long[] $mins = new long[$wins];
         |  for (int $i = 0; $i < $wins; $i++) {
         |    long $mn = $gh[$i];
         |    for (int $j = 1; $j < $window; $j++) {
         |      if ($gh[$i + $j] < $mn) $mn = $gh[$i + $j];
         |    }
         |    $mins[$i] = $mn;
         |  }
         |  java.util.Arrays.sort($mins);
         |  int $d = 0;
         |  for (int $i = 0; $i < $wins; $i++) {
         |    if ($i == 0 || $mins[$i] != $mins[$i - 1]) { $mins[$d] = $mins[$i]; $d++; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($mins, $d));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WinnowMins =
    copy(child = c)
}

/** Greedy bin-packing indices: given per-item weights and a budget,
  * assign each item (in order) the index of the chunk it falls into —
  * a new chunk starts whenever adding the item would exceed the
  * budget. The sequential-state loop no window or HOF expresses
  * without quadratic array copying; here it is one codegen'd linear
  * pass per row. An item heavier than the whole budget gets a chunk
  * of its own (the only case a chunk exceeds the budget). Null weight
  * slots count 0.
  */
case class GreedyChunkIndices(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(w: Any, b: Any): Any = {
    val ws = w.asInstanceOf[ArrayData]
    val budget = b.asInstanceOf[Long]
    val n = ws.numElements()
    val out = new Array[Long](n)
    var cnt = 0L; var idx = 0L; var i = 0
    while (i < n) {
      val p = if (ws.isNullAt(i)) 0L else ws.getLong(i)
      if (cnt > 0L && cnt + p > budget) { idx += 1L; cnt = 0L }
      cnt += p
      out(i) = idx
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt"); val idx = ctx.freshName("idx")
      val out = ctx.freshName("out"); val p = ctx.freshName("p")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |long $cnt = 0L; long $idx = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $p = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |  if ($cnt > 0L && $cnt + $p > $b) { $idx++; $cnt = 0L; }
         |  $cnt += $p;
         |  $out[$i] = $idx;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GreedyChunkIndices =
    copy(left = l, right = r)
}

/** Pack an `array<long>` of int8-range values into a BINARY column,
  * one signed byte per element (clamped to [-127, 127]). This is the
  * serving layout of the quantized ANN index: parquet stores a
  * tinyint physically as an annotated int32, so an int8 vector kept
  * as an array column is no smaller than float32 — a packed binary is
  * genuinely `dim` bytes per vector, the 8× saving the int8 story
  * promises. Unpack-free consumption via `BinaryDot`.
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0L else a.getLong(i)
      out(i) = math.max(-127L, math.min(127L, x)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |  $out[$i] = (byte) java.lang.Math.max(-127L, java.lang.Math.min(127L, $x));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PackInt8 =
    copy(child = c)
}

/** Dot product of two packed-int8 BINARY vectors (see `PackInt8`) as
  * a tight signed-byte loop — the hot scan kernel of the quantized
  * ANN index. Sums in a long (max |dim × 127²| ≈ 1.2e7 at dim 768,
  * nowhere near overflow) and returns double for direct use in the
  * approximate-cosine formula.
  */
case class BinaryDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i).toLong * y(i).toLong; i += 1 }
    s.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = (double) $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BinaryDot =
    copy(left = l, right = r)
}

/** Space-join the tokens whose positions are NOT in a SORTED excluded
  * list — the rebuild step of substring-level dedup
  * (`Dedup.stripDuplicateSpans`). One merge walk: pointer `i` over
  * tokens, pointer `j` over the excluded positions, so the cost is
  * O(tokens + excluded) per document. The `array_contains`-per-token
  * form this replaces re-scanned the excluded set for every token —
  * O(tokens × excluded), quadratic on a long fully-duplicated doc
  * (exactly the shape mass-boilerplate corpora produce). Excluded
  * positions must be sorted ascending (`array_sort`); null token
  * slots and null/out-of-range excluded entries are skipped.
  */
case class ConcatExcludingPositions(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(t: Any, e: Any): Any = {
    val toks = t.asInstanceOf[ArrayData]
    val ex = e.asInstanceOf[ArrayData]
    val n = toks.numElements(); val m = ex.numElements()
    val kept = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0; var j = 0
    while (i < n) {
      while (j < m && (ex.isNullAt(j) || ex.getInt(j) < i)) j += 1
      val drop = j < m && ex.getInt(j) == i
      if (!drop && !toks.isNullAt(i)) kept.add(toks.getUTF8String(i))
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.concatWs(
      org.apache.spark.unsafe.types.UTF8String.fromString(" "),
      kept.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](kept.size)): _*)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val kept = ctx.freshName("kept")
      val drop = ctx.freshName("drop")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |java.util.ArrayList<$u> $kept = new java.util.ArrayList<$u>($n);
         |int $j = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  while ($j < $m && ($b.isNullAt($j) || $b.getInt($j) < $i)) { $j++; }
         |  boolean $drop = $j < $m && $b.getInt($j) == $i;
         |  if (!$drop && !$a.isNullAt($i)) { $kept.add($a.getUTF8String($i)); }
         |}
         |${ev.value} = $u.concatWs($u.fromString(" "),
         |  ($u[]) $kept.toArray(new $u[0]));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ConcatExcludingPositions =
    copy(left = l, right = r)
}

/** Bounded top-k aggregate over (score, id) pairs.
  *
  * The scale story: computing per-group top-k with a window function
  * ranks EVERY row (full sort of each partition after a shuffle of
  * every scored row). This aggregate keeps a k-element heap per
  * group and participates in partial aggregation — each map task
  * ships at most k pairs per group, so the shuffle is O(groups × k)
  * regardless of corpus size. That is the difference between an ANN
  * scan that works at 100 TB and one that sorts 100 TB.
  *
  * Output: `array<struct<score double, id bigint>>`, score
  * descending, ties broken by ascending id (deterministic).
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // Max-heap on (-score, id): the head is the WORST kept pair
  // (lowest score; among ties, the largest id), popped when full.
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by((t: (Double, Long)) => (-t._1, t._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { t =>
      buf.enqueue(t)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map(t =>
      InternalRow(t._1, t._2): Any).toArray)
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { t => bb.putDouble(t._1); bb.putLong(t._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

/** Misra–Gries frequent-items sketch over a string column (Misra &
  * Gries 1982, "Finding repeated elements"; merge rule from Agarwal
  * et al. 2012, "Mergeable summaries").
  *
  * The scale story: exact token frequencies over a 100 TB corpus
  * shuffle one row per DISTINCT token — fine for a closed vocabulary,
  * unbounded for open web text (URLs, ids, typos make the vocabulary
  * grow with the corpus). This aggregate keeps at most `k` counters
  * per partial buffer, so the shuffle is O(partitions × k) no matter
  * the vocabulary, and it participates in partial aggregation like
  * any built-in. Guarantee: every item with true frequency
  * > N/(k+1) survives to the final buffer, and each kept counter
  * undercounts by at most N/(k+1) — a candidate set, not final
  * counts, which is why `HeavyHitters.frequentTokens` recounts the
  * survivors exactly (two bounded passes ⇒ exact answer, oracled).
  *
  * Output: `array<struct<token string, cnt long>>`, estimated count
  * descending, ties by token ascending (deterministic; counts are
  * the sketch's lower-bound estimates).
  */
case class MisraGriesTokens(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.toString
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None if buf.size < k => buf.update(t, 1L)
        case None =>
          // Full and unseen: decrement every counter (the classic MG
          // step — equivalent to discarding one occurrence of each of
          // k+1 distinct items), dropping zeros to free a slot.
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      // Mergeable-summaries rule: subtract the (k+1)-th largest
      // count from every counter, keep strictly-positive ones —
      // at most k survive and the error bound telescopes.
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val v = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - v)
      buf.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(t), c): Any
    }.toArray)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesTokens =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesTokens =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTokens =
    copy(child = newChildren(0))
}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over PRE-HASHED
  * long keys: a depth×width counter matrix; each key increments one
  * bucket per row via an independent affine rehash of its input
  * hash, a point query reads the MINIMUM of its depth buckets. The
  * complement of [[MisraGriesTokens]]: MG tracks the top-k identities
  * in O(k) state, CMS answers a frequency estimate for ANY key —
  * including keys chosen after the scan — in O(depth·width) state,
  * and never undercounts (estimate ≥ true count; over by ≤ εN with
  * ε = e/width at probability 1 − e^−depth).
  *
  * Takes the key pre-hashed (e.g. `TextAnalysis.fingerprint`, the
  * 31-base polynomial both engines can compute) so the bucket
  * mapping `((h·a_i + b_i) mod P) mod width` is pure integer
  * arithmetic — partials merge by elementwise ADD (exact, order
  * independent), making the finished sketch BIT-IDENTICAL on any
  * engine/partitioning and therefore fully oracle-able, unusual for
  * a sketch. Buffer is depth·width longs regardless of input size;
  * partial aggregation ships one such array per map task.
  */
case class CountMinLongs(
    child: Expression,
    width: Int,
    depth: Int,
    seeds: Seq[(Long, Long)],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0 && depth > 0 && seeds.length == depth,
    "need width > 0 and one (a,b) seed pair per depth row")

  val P = 1000000007L
  @transient private lazy val as: Array[Long] = seeds.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = seeds.map(_._2).toArray

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] % P
      var i = 0
      while (i < depth) {
        // floorMod: a negative input hash must land in [0, width)
        val x = java.lang.Math.floorMod(
          java.lang.Math.floorMod(h * as(i) + bs(i), P), width.toLong).toInt
        buf(i * width + x) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.asLongBuffer().put(buf)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(offset: Int): CountMinLongs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinLongs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinLongs =
    copy(child = newChildren(0))
}

/** Unicode NFC normalization of a string column.
  *
  * Spark ships no Unicode normalizer, yet content-hash dedup and
  * exact contamination checks are silently wrong without one: "é"
  * composed (U+00E9) and "e" + combining acute (U+0301) are
  * byte-different — hash-different — renderings of the same text, so
  * un-normalized corpora under-deduplicate. Canonical composition
  * (NFC) is the standard pre-hash canonicalization. Implementation
  * is the JDK's `java.text.Normalizer` (Unicode-conformant, the same
  * canonical composition DuckDB's `nfc_normalize` implements, which
  * makes the expression fully cross-engine oracle-able). The
  * fast-path check `Normalizer.isNormalized` skips allocation for
  * already-NFC text — the overwhelming case in real corpora.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = $u.fromString(
         |    java.text.Normalizer.normalize($str, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

/** Per-row character-bigram statistics for Shannon-entropy quality
  * signals: struct<n_grams, n_distinct, clogc> where clogc =
  * Σ c·ln c over the bigram counts — the caller derives entropy as
  * ln(n) − clogc/n (gibberish and encoding junk score far from
  * natural text; keyboard-mash has high entropy, "aaaa…" zero).
  *
  * One pass per row, ZERO shuffle at any corpus size: each bigram
  * packs into a long (two UTF-16 units), counting is sort + run-scan
  * over a primitive array — no hash map (Janino-friendly, no boxing)
  * and no explode-groupBy(doc, gram), which would shuffle O(chars)
  * rows. Σ accumulates in ascending-run order (sorted codes), so the
  * result is partition- and input-order-independent. UTF-16-unit
  * bigrams coincide with code-point bigrams for all BMP text (the
  * whole synthetic corpus and virtually all real text).
  */
case class CharBigramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("clogc", DoubleType, nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val str = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val m = str.length - 1
    var d = 0L
    var s = 0.0
    if (m > 0) {
      val codes = new Array[Long](m)
      var i = 0
      while (i < m) {
        codes(i) = (str.charAt(i).toLong << 16) | str.charAt(i + 1).toLong
        i += 1
      }
      java.util.Arrays.sort(codes)
      var k = 0
      while (k < m) {
        var j = k + 1
        while (j < m && codes(j) == codes(k)) j += 1
        d += 1
        val c = (j - k).toDouble
        s += c * math.log(c)
        k = j
      }
    }
    InternalRow(math.max(m, 0).toLong, d, s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val str = ctx.freshName("str"); val m = ctx.freshName("m")
      val codes = ctx.freshName("codes"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val hi = ctx.freshName("hi"); val lo = ctx.freshName("lo")
      // NOTE: Janino mis-parses "((long) x.charAt(i)) << 16" as a
      // type expression — keep the cast and the shift in separate
      // statements or codegen silently falls back to interpreted
      // eval (caught by the fallback-disabled spec).
      s"""
         |String $str = $a.toString();
         |int $m = $str.length() - 1;
         |long $d = 0L; double $s = 0.0;
         |if ($m > 0) {
         |  long[] $codes = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $hi = (long) $str.charAt($i);
         |    long $lo = (long) $str.charAt($i + 1);
         |    $codes[$i] = ($hi << 16) | $lo;
         |  }
         |  java.util.Arrays.sort($codes);
         |  int $k = 0;
         |  while ($k < $m) {
         |    int $j = $k + 1;
         |    while ($j < $m && $codes[$j] == $codes[$k]) $j++;
         |    $d++;
         |    double $c = (double) ($j - $k);
         |    $s += $c * Math.log($c);
         |    $k = $j;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { (long) Math.max($m, 0), $d, $s });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharBigramStats =
    copy(child = newChild)
}

/** Mutable accumulator for [[VectorMoments]]: count, per-dimension
  * sums, and the upper triangle of the cross-product matrix.
  */
final class MomentsBuf(var n: Long, var sum: Array[Double], var ss: Array[Double]) {
  def init(d: Int): Unit = {
    sum = new Array[Double](d)
    ss = new Array[Double](d * (d + 1) / 2)
  }
}

/** Single-pass mean + covariance of a vector column.
  *
  * The scale story: the covariance matrix of an embedding corpus is
  * the input to whitening, drift monitoring, and PCA-style
  * compaction — but computing it by exploding (vector, dim) pairs
  * and self-joining shuffles O(rows × d²) values. This aggregate
  * carries ONE buffer of d + d(d+1)/2 doubles per partition (64-dim
  * ⇒ ~17 KB), participates in partial aggregation, and ships
  * O(partitions × d²) bytes total — corpus-size-independent, the
  * same mergeable-summary shape as the HLL/Misra-Gries sketches.
  *
  * Output: struct<n bigint, means array<double>,
  * pairs array<struct<i int, j int, cov double>>> with `pairs` the
  * upper triangle (i ≤ j) of the POPULATION covariance, row-major,
  * cov(i,j) = Σxy/n − x̄ȳ. Null vectors are skipped; a dimension
  * mismatch throws (silently truncating would corrupt every moment).
  */
case class VectorMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsBuf] {

  override def createAggregationBuffer(): MomentsBuf =
    new MomentsBuf(0L, null, null)

  override def update(buf: MomentsBuf, input: InternalRow): MomentsBuf = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val d = a.numElements()
      if (buf.sum == null) buf.init(d)
      require(buf.sum.length == d,
        s"vectorMoments: dimension mismatch (${buf.sum.length} vs $d)")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        require(!a.isNullAt(i), "vectorMoments: null vector element")
        x(i) = a.getDouble(i); i += 1
      }
      var k = 0
      i = 0
      while (i < d) {
        buf.sum(i) += x(i)
        var j = i
        while (j < d) { buf.ss(k) += x(i) * x(j); k += 1; j += 1 }
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: MomentsBuf, other: MomentsBuf): MomentsBuf = {
    if (other.sum != null) {
      if (buf.sum == null) buf.init(other.sum.length)
      require(buf.sum.length == other.sum.length,
        s"vectorMoments: dimension mismatch (${buf.sum.length} vs ${other.sum.length})")
      var i = 0
      while (i < buf.sum.length) { buf.sum(i) += other.sum(i); i += 1 }
      i = 0
      while (i < buf.ss.length) { buf.ss(i) += other.ss(i); i += 1 }
      buf.n += other.n
    }
    buf
  }

  override def eval(buf: MomentsBuf): Any = {
    if (buf.sum == null || buf.n == 0L) return null
    val d = buf.sum.length
    val n = buf.n.toDouble
    val means = buf.sum.map(_ / n)
    val pairs = new Array[Any](buf.ss.length)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        pairs(k) = InternalRow(i, j, buf.ss(k) / n - means(i) * means(j))
        k += 1; j += 1
      }
      i += 1
    }
    InternalRow(buf.n, new GenericArrayData(means), new GenericArrayData(pairs))
  }

  override def serialize(buf: MomentsBuf): Array[Byte] = {
    val d = if (buf.sum == null) 0 else buf.sum.length
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 * d + 8 * (d * (d + 1) / 2))
    bb.putInt(d); bb.putLong(buf.n)
    if (d > 0) { buf.sum.foreach(bb.putDouble); buf.ss.foreach(bb.putDouble) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val buf = new MomentsBuf(bb.getLong, null, null)
    if (d > 0) {
      buf.init(d)
      var i = 0
      while (i < d) { buf.sum(i) = bb.getDouble; i += 1 }
      i = 0
      while (i < buf.ss.length) { buf.ss(i) = bb.getDouble; i += 1 }
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("means", ArrayType(DoubleType, containsNull = false)),
    StructField("pairs", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("cov", DoubleType, nullable = false)))))))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): VectorMoments =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorMoments =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMoments =
    copy(child = newChildren(0))
}

/** Column-API entry points for the native expressions. */
object Native {
  /** Codegen'd dot product; inputs are cast to array<double> so
    * float arrays don't silently read garbage through getDouble.
    */
  def doubleDot(a: Column, b: Column): Column =
    GraftBridge.column(DoubleDot(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))

  /** Bounded top-k aggregate: array<struct<score,id>> best-first.
    * Inputs are cast to the buffer types (double score, long id) so
    * int ids / float scores don't ClassCastException mid-job.
    */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKPairs(
      GraftBridge.expression(score.cast("double")),
      GraftBridge.expression(id.cast("long")), k).toAggregateExpression())

  /** Unicode NFC canonicalization (see NormalizeNfc): apply before
    * content hashing so composed/decomposed renderings dedup.
    */
  def normalizeNfc(text: Column): Column =
    GraftBridge.column(NormalizeNfc(
      GraftBridge.expression(text.cast("string"))))

  /** Per-row char-bigram stats struct<n_grams, n_distinct, clogc>
    * for Shannon-entropy signals (see CharBigramStats).
    */
  def charBigramStats(text: Column): Column =
    GraftBridge.column(CharBigramStats(
      GraftBridge.expression(text.cast("string"))))

  /** Single-pass vector mean + covariance:
    * struct<n, means, pairs(i,j,cov)> — see VectorMoments.
    */
  def vectorMoments(vec: Column): Column =
    GraftBridge.column(VectorMoments(
      GraftBridge.expression(vec.cast("array<double>"))).toAggregateExpression())

  /** Misra–Gries frequent-items sketch: array<struct<token,cnt>>
    * candidates (estimates, not exact — see MisraGriesTokens).
    */
  def misraGries(token: Column, k: Int): Column =
    GraftBridge.column(MisraGriesTokens(
      GraftBridge.expression(token.cast("string")), k).toAggregateExpression())

  /** Count-Min sketch over pre-hashed long keys: array<long> of
    * depth·width counters (row-major); point estimates via
    * [[graft.ops.HeavyHitters.cmsEstimate]].
    */
  def countMin(hash: Column, width: Int, depth: Int,
               seeds: Seq[(Long, Long)]): Column =
    GraftBridge.column(CountMinLongs(
      GraftBridge.expression(hash.cast("long")), width, depth, seeds)
      .toAggregateExpression())

  /** Codegen'd merge-walk intersection size of sorted long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a.cast("array<long>")),
      GraftBridge.expression(b.cast("array<long>"))))

  /** Codegen'd merge-walk token rebuild: space-join tokens whose
    * positions are not in the SORTED excluded list (O(n+m) per row).
    */
  def concatExcluding(tokens: Column, excludedSorted: Column): Column =
    GraftBridge.column(ConcatExcludingPositions(
      GraftBridge.expression(tokens.cast("array<string>")),
      GraftBridge.expression(excludedSorted.cast("array<int>"))))

  /** Codegen'd k-permutation MinHash signature of shingle hashes
    * (bit-identical to the xxhash64 fold form).
    */
  def minHashSig(shingleHashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(
      GraftBridge.expression(shingleHashes.cast("array<long>")), k))

  /** Codegen'd highest element frequency of a string array. */
  def maxFreq(values: Column): Column =
    GraftBridge.column(MaxFreq(GraftBridge.expression(values.cast("array<string>"))))

  /** Codegen'd highest element frequency of a long array. */
  def maxFreqLong(values: Column): Column =
    GraftBridge.column(MaxFreqLong(GraftBridge.expression(values.cast("array<long>"))))

  /** Codegen'd positional n-gram rolling hashes of a token array
    * (bit-identical to the xxhash64 slice/zip_with chain form).
    */
  def gramHashes(tokens: Column, n: Int): Column =
    GraftBridge.column(GramHashes(
      GraftBridge.expression(tokens.cast("array<string>")), n))

  /** Codegen'd universal-hash MinHash over string shingles
    * (bit-identical to the polynomial-hash fold form).
    */
  def polyMinHash(shingles: Column, k: Int,
                  params: Seq[(Long, Long)]): Column =
    GraftBridge.column(PolyMinHash(
      GraftBridge.expression(shingles.cast("array<string>")), k, params))

  /** Codegen'd 30-bit SimHash of a token array (bit-identical to the
    * composed distinct+poly+majority fold).
    */
  def simHash30(tokens: Column): Column =
    GraftBridge.column(SimHash30(GraftBridge.expression(tokens.cast("array<string>"))))

  /** Codegen'd universal-hash MinHash over word n-grams of a token
    * array (bit-identical to PolyMinHash over the distinct gram
    * strings, which are never materialized).
    */
  def polyMinHashGrams(tokens: Column, n: Int, k: Int,
                       params: Seq[(Long, Long)]): Column =
    GraftBridge.column(PolyMinHashGrams(
      GraftBridge.expression(tokens.cast("array<string>")), n, k, params))

  /** Codegen'd within-doc duplicated-gram counts:
    * struct(dup_occ, covered) over a positional gram-hash array.
    */
  def dupGramCounts(gramHashes: Column, n: Int): Column =
    GraftBridge.column(DupGramCounts(
      GraftBridge.expression(gramHashes.cast("array<long>")), n))

  /** Codegen'd winnowing fingerprints (sorted distinct window minima
    * of k-gram 31-base polynomial hashes) of a token array.
    */
  def winnowMins(tokens: Column, k: Int, window: Int): Column =
    GraftBridge.column(WinnowMins(
      GraftBridge.expression(tokens.cast("array<string>")), k, window))

  /** Greedy bin-packing chunk index per item (codegen'd linear pass). */
  def greedyChunkIndices(weights: Column, budget: Column): Column =
    GraftBridge.column(GreedyChunkIndices(
      GraftBridge.expression(weights.cast("array<long>")),
      GraftBridge.expression(budget.cast("long"))))

  /** Pack int8-range longs into one signed byte each (binary). */
  def packInt8(values: Column): Column =
    GraftBridge.column(PackInt8(GraftBridge.expression(values.cast("array<long>"))))

  /** Codegen'd signed-byte dot product of two packed-int8 binaries. */
  def binaryDot(a: Column, b: Column): Column =
    GraftBridge.column(BinaryDot(
      GraftBridge.expression(a.cast("binary")),
      GraftBridge.expression(b.cast("binary"))))
}
