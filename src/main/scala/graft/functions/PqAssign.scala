package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_assign(vec, m, ksub, dsub, books_flat)` — product-quantization code
  * assignment as ONE native Catalyst expression: split the `array<double>`
  * vector into `m` subspaces of `dsub` components and return the
  * `array<int>` of nearest-sub-centroid codes, argmin over the `ksub`
  * centroids of subspace j of |c|² − 2·v_j·c (ties to the smaller code).
  *
  * Why an Expression and not the declarative per-centroid column tree: the
  * column form inlines m×ksub centroids (≈2k doubles) as codegen literals
  * inside one `Generate.doConsume`, which blows Janino's 64 KB method /
  * constant-pool limits — Spark then silently falls back to interpreted
  * evaluation on the encode scan, the designed map-only hot path for a
  * 100 TB corpus (round-7 verdict #1). Here the codebook travels as a
  * DRIVER REFERENCE OBJECT (`ctx.addReferenceObj`) — one flat `double[]`
  * indexed [j][c][p] — so the generated code is a fixed three-deep loop a
  * few dozen lines long regardless of m/ksub/dim, stays inside
  * whole-stage codegen, and the JIT vectorizes the inner dot product.
  *
  * Bit-exactness contract (must match the replayable-oracle arithmetic of
  * the previous declarative form exactly):
  *   - cn(j,c) = Σ_p c_p² summed ascending p (precomputed once per plan);
  *   - dot = Σ_p v[j·dsub+p]·c_p ascending p, over the elements that
  *     exist (a short vector contributes fewer terms — the
  *     [[ArrayDotProduct]] min-length convention);
  *   - d2 = cn − 2.0·dot, strict `<` scan ⇒ FIRST minimal code wins.
  * All inputs ride the 1e7 quantization grid, so every d2 is an exact
  * integer-valued double and the tie probe is engine-independent.
  *
  * `booksFlat` must be a foldable `array<double>` literal of length
  * m·ksub·dsub (codebooks are driver-trained model artifacts, bounded to
  * a few KB — [[graft.operators.Similarity]] codebookCache).
  */
case class PqAssign(vec: Expression, m: Int, ksub: Int, dsub: Int,
    booksFlat: Expression)
    extends UnaryExpression with Serializable {

  override def child: Expression = vec

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(vec = newChild)

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!arr(vec.dataType) || !arr(booksFlat.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"pq_assign expects (array<double>, array<double>), got " +
          s"(${vec.dataType.sql}, ${booksFlat.dataType.sql})")
    else if (!booksFlat.foldable)
      TypeCheckResult.TypeCheckFailure("pq_assign codebook must be foldable")
    else if (m <= 0 || ksub <= 0 || dsub <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"pq_assign needs m, ksub, dsub > 0, got ($m, $ksub, $dsub)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** The codebook as a flat driver array, [j][c][p] ⇒ (j·ksub+c)·dsub+p. */
  @transient private lazy val flat: Array[Double] = {
    val a = booksFlat.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    require(a.length == m * ksub * dsub,
      s"pq_assign codebook length ${a.length} != m*ksub*dsub = ${m * ksub * dsub}")
    a
  }

  /** Σ c_p² per (j, c), ascending-p summation — identical double sequence
    * to the declarative form's `cent.map(x => x*x).sum` literals. */
  @transient private lazy val cn: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var jc = 0
    while (jc < m * ksub) {
      var s = 0.0
      var p = 0
      while (p < dsub) { val x = flat(jc * dsub + p); s += x * x; p += 1 }
      out(jc) = s
      jc += 1
    }
    out
  }

  private def assign(v: ArrayData): GenericArrayData = {
    val n = v.numElements()
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var dot = 0.0
        var p = 0
        while (p < dsub && j * dsub + p < n) {
          dot += v.getDouble(j * dsub + p) * flat(base + p)
          p += 1
        }
        val d2 = cn(j * ksub + c) - 2.0 * dot
        if (d2 < best) { best = d2; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(a: Any): Any = assign(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
      val cnRef = ctx.addReferenceObj("pqCn", cn, "double[]")
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val dot = ctx.freshName("dot")
      val d2 = ctx.freshName("d2")
      val base = ctx.freshName("base")
      s"""
         |int $n = $v.numElements();
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    double $dot = 0.0;
         |    for (int $p = 0; $p < $dsub && $j * $dsub + $p < $n; $p++) {
         |      $dot += $v.getDouble($j * $dsub + $p) * $flatRef[$base + $p];
         |    }
         |    double $d2 = $cnRef[$j * $ksub + $c] - 2.0 * $dot;
         |    if ($d2 < $best) { $best = $d2; $bestC = $c; }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override def prettyName: String = "pq_assign"
}
