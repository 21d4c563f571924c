package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** JVM-wide memo of flattened plane matrices: expressions
  * deserialize once per task, and recomputing numPlanes x dim md5
  * derivations (51 k strings for the default forest) per task is
  * avoidable constant work. Keyed by (numPlanes, dim); values are
  * deterministic, so racing writers are idempotent. */
private[graft] object LshPlanes {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  def flat(numPlanes: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((numPlanes, dim), { case (np, d) =>
      val ps = graft.operators.AnnLsh.planes(np, d)
      val out = new Array[Double](np * d)
      var g = 0
      while (g < ps.length) {
        System.arraycopy(ps(g), 0, out, g * d, d)
        g += 1
      }
      out
    })
}

/** Per-table LSH bucket keys for a forest of L independent
  * random-hyperplane tables — the scan-native analogue of the
  * reference's LSH forest (lshtree.go:88 `numTrees` trees; each tree
  * adapts its splits, each of our tables draws an independent plane
  * set; both answer a query from the union of per-tree candidates,
  * lshtree.go:283-336).
  *
  * Table `t` uses planes with global indices `g = t*bits + j`,
  * `j < bits`, drawn from the same deterministic md5 scheme as the
  * single-table index (`AnnLsh.planes`): plane g, dim d is
  * `(hash64(g + "_" + d) mod 1000)/1000 - 0.5`. The emitted key packs
  * the table id above the bucket bits — `(t << bits) | bucket` — so
  * one `array<long>` column carries the whole forest membership and a
  * probe is "does the row's key array hit any of the query's L keys".
  *
  * Why a native expression: L*bits plane dots per row (e.g. 60 tables
  * x 8 planes = 480 64-dim dots) as HOF combinations would run
  * interpreted and re-evaluate aliases per element (the alias-inline
  * trap); this codegens to one tight triple loop over a referenced
  * plane matrix — no allocation beyond the L-long output.
  */
case class MultiLshBuckets(child: Expression, numTables: Int,
                           bitsPerTable: Int, dim: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Flattened plane matrix, row-major: plane g spans
    * [g*dim, (g+1)*dim). Memoized JVM-wide (deterministic). */
  @transient private lazy val flatPlanes: Array[Double] =
    LshPlanes.flat(numTables * bitsPerTable, dim)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var j = 0
      while (j < bitsPerTable) {
        val base = (t * bitsPerTable + j) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (!x.isNullAt(i)) acc += x.getDouble(i) * flatPlanes(base + i)
          i += 1
        }
        if (acc > 0.0) bucket |= (1L << j)
        j += 1
      }
      out(t) = (t.toLong << bitsPerTable) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("flatPlanes", flatPlanes, "double[]")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      // copy the vector ONCE into a zero-padded local (nulls -> 0, the
      // same contribution as skipping); the L*bits plane loops then run
      // branch-free over two flat double[]s — JIT-vectorizable, ~3x
      // over the per-element isNullAt formulation at 800 planes
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $v = new double[$dim];
         |for (int $i = 0; $i < $n; $i++) {
         |  $v[$i] = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |}
         |long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bitsPerTable; $j++) {
         |    int $base = ($t * $bitsPerTable + $j) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $v[$i] * $planes[$base + $i];
         |    }
         |    if ($acc > 0.0) $bucket |= (1L << $j);
         |  }
         |  $out[$t] = ((long) $t << $bitsPerTable) | $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiLshBuckets {
  /** Column API: array<long> of `(t << bits) | bucket_t` keys. */
  def keys(vec: Column, numTables: Int, bitsPerTable: Int, dim: Int): Column =
    GraftBridge.toColumn(MultiLshBuckets(
      GraftBridge.toExpression(vec.cast("array<double>")),
      numTables, bitsPerTable, dim))
}

/** Boolean probe: does this vector land in ANY of the query's probe
  * buckets? Computes table t's bucket and compares it to the query's
  * `keysPerTable` probe keys for t, returning on the first hit — a
  * candidate row typically agrees early, so the scan does far fewer
  * than L*bits plane dots on hits. A single self-contained predicate
  * (one child reference) so predicate pushdown can move it without
  * duplicating an expensive aliased signature column.
  *
  * `keysPerTable` = 1 is the plain forest probe (the query's own
  * bucket per table); > 1 is query-directed multiprobe (Lv et al.
  * 2007): the extra keys are the query's bucket with its
  * lowest-|margin| bits flipped — the scan analogue of the
  * reference's boundary backtracking (lshtree.go:283-336, the
  * `|dist-to-hyperplane| > radius` early-stop). queryKeys is grouped
  * per table: table t's probes are
  * queryKeys[t*keysPerTable, (t+1)*keysPerTable). */
case class LshForestHit(child: Expression, queryKeys: Seq[Long],
                        bitsPerTable: Int, dim: Int, keysPerTable: Int = 1)
  extends UnaryExpression {

  require(keysPerTable >= 1 && queryKeys.length % keysPerTable == 0,
    s"queryKeys (${queryKeys.length}) must be numTables x keysPerTable ($keysPerTable)")

  private def numTables: Int = queryKeys.length / keysPerTable

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  // Seq, not Array, in the case-class fields: Array equality is
  // reference-based, so two structurally identical predicates would
  // never compare equal — defeating semanticEquals-driven reuse
  // (subexpression elimination, exchange/plan reuse)
  @transient private lazy val qk: Array[Long] = queryKeys.toArray

  @transient private lazy val flatPlanes: Array[Double] =
    LshPlanes.flat(numTables * bitsPerTable, dim)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var j = 0
      while (j < bitsPerTable) {
        val base = (t * bitsPerTable + j) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (!x.isNullAt(i)) acc += x.getDouble(i) * flatPlanes(base + i)
          i += 1
        }
        if (acc > 0.0) bucket |= (1L << j)
        j += 1
      }
      val key = (t.toLong << bitsPerTable) | bucket
      var p = t * keysPerTable
      val end = p + keysPerTable
      while (p < end) {
        if (key == qk(p)) return true
        p += 1
      }
      t += 1
    }
    false
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("flatPlanes", flatPlanes, "double[]")
      val qkRef = ctx.addReferenceObj("queryKeys", qk, "long[]")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val hit = ctx.freshName("hit")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val key = ctx.freshName("key")
      // same local-copy fast path as MultiLshBuckets: one null-safe
      // copy, then branch-free flat-array loops (JIT-vectorizable)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $v = new double[$dim];
         |for (int $i = 0; $i < $n; $i++) {
         |  $v[$i] = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |}
         |boolean $hit = false;
         |for (int $t = 0; $t < $numTables && !$hit; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bitsPerTable; $j++) {
         |    int $base = ($t * $bitsPerTable + $j) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $v[$i] * $planes[$base + $i];
         |    }
         |    if ($acc > 0.0) $bucket |= (1L << $j);
         |  }
         |  long $key = ((long) $t << $bitsPerTable) | $bucket;
         |  for (int $p = $t * $keysPerTable; $p < ($t + 1) * $keysPerTable; $p++) {
         |    if ($key == $qkRef[$p]) { $hit = true; break; }
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshForestHit {
  def hit(vec: Column, queryKeys: Seq[Long], bitsPerTable: Int, dim: Int,
          keysPerTable: Int = 1): Column =
    GraftBridge.toColumn(LshForestHit(
      GraftBridge.toExpression(vec.cast("array<double>")),
      queryKeys.toList, bitsPerTable, dim, keysPerTable))
}
