package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for vector kernels where the higher-order
  * function formulation is interpreted and measurably hot. All implement
  * `doGenCode` (a static call into [[VectorKernels]]), so surrounding
  * operators stay inside whole-stage codegen — no CodegenFallback boxing.
  */
object VectorExpressions {

  /** Random-hyperplane LSH bucket of an `array<double>` vector: bit `p` of
    * the result is the sign of the projection onto pseudo-random plane `p`
    * (see [[VectorKernels.hyperplaneBucket]]). Dimension is read from the
    * array. */
  case class HyperplaneLshBucket(child: Expression, nPlanes: Int,
                                 planeOffset: Int = 0)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "hyperplane_lsh_bucket"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        VectorKernels.hyperplaneBucket(input.asInstanceOf[ArrayData], nPlanes,
          planeOffset))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorKernels.hyperplaneBucket($c, $nPlanes, $planeOffset);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def hyperplaneLshBucket(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    ColumnBridge.column(
      HyperplaneLshBucket(ColumnBridge.expression(vec), nPlanes, planeOffset))

  /** Σ aᵢ·bᵢ over two `array<double>` columns. Accumulates sequentially
    * left-to-right — the same order as the higher-order-function
    * formulation and DuckDB's list_inner_product — so results are
    * bit-identical across engines; null if the lengths differ. */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "vector_dot"

    override def nullSafeEval(l: Any, r: Any): Any =
      VectorKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("dot")
        s"""
           |java.lang.Double $tmp = graft.functions.VectorKernels.dot($a, $b);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Index of the nearest centroid (squared-euclidean argmin) for an
    * `array<double>` vector, against a small centroid set embedded in the
    * plan. Since ‖v‖² is constant across centroids, the score is
    * ‖c‖² − 2·v·c; ties break to the lowest index. One tight k×dim pass
    * per row — no join, no shuffle, no row fan-out — which is what lets a
    * Lloyd assignment step run as a pure projection over the corpus. */
  case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "nearest_centroid"

    @transient private lazy val cvecs: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    @transient private lazy val cnorm2: Array[Double] = cvecs.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

    override def nullSafeEval(input: Any): Any =
      VectorKernels.nearestCentroid(input.asInstanceOf[ArrayData], cvecs, cnorm2)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", cvecs, "double[][]")
      val nRef = ctx.addReferenceObj("cnorm2", cnorm2, "double[]")
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("nearest")
        s"""
           |java.lang.Integer $tmp =
           |  graft.functions.VectorKernels.nearestCentroid($c, $cRef, $nRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.intValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), centroids))

  /** Nearest sub-centroid WITHIN the row's level-1 cell — the level-2
    * assignment of a hierarchical coarse quantizer
    * ([[graft.operators.IvfIndex.buildTwoLevel]]). The full k1×k2 bank
    * rides the plan as one reference object (like [[NearestCentroid]]'s
    * centroid list), but each row's argmin touches only its own cell's
    * k2 sub-centroids: assignment stays a pure per-row projection at
    * O(k2·dim), which is what makes tens of thousands of effective
    * cells affordable where a flat codebook's O(k·dim) is not. */
  case class NearestCentroidBank(left: Expression, right: Expression,
                                 banks: Seq[Seq[Seq[Double]]])
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "nearest_centroid_bank"

    @transient private lazy val bankArr: Array[Array[Array[Double]]] =
      banks.map(_.map(_.toArray).toArray).toArray
    @transient private lazy val cn2Arr: Array[Array[Double]] =
      bankArr.map(_.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i) * c(i); i += 1 }
        s
      })

    override def nullSafeEval(v: Any, cell: Any): Any =
      VectorKernels.nearestCentroidBank(v.asInstanceOf[ArrayData],
        cell.asInstanceOf[Int], bankArr, cn2Arr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bRef = ctx.addReferenceObj("centroidBanks", bankArr, "double[][][]")
      val nRef = ctx.addReferenceObj("bankNorm2", cn2Arr, "double[][]")
      nullSafeCodeGen(ctx, ev, (v, cell) => {
        val tmp = ctx.freshName("nearestBank")
        s"""
           |java.lang.Integer $tmp =
           |  graft.functions.VectorKernels.nearestCentroidBank($v, $cell, $bRef, $nRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.intValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def nearestCentroidBank(vec: Column, cell: Column,
                          banks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(NearestCentroidBank(ColumnBridge.expression(vec),
      ColumnBridge.expression(cell), banks))

  /** Product-quantization code (binary, one byte per subspace) of an
    * `array<double>` vector against trained codebooks embedded in the plan
    * (`codebooks(j)` = subspace j's `ks` centroids, flattened row-major).
    * Encoding the corpus is a pure projection — no join, no shuffle — so
    * the encoded table's lineage is scan + expression, the same property
    * [[NearestCentroid]] gives the IVF assignment. */
  case class PqEncode(child: Expression, codebooks: Seq[Seq[Double]])
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_encode"

    @transient private lazy val cbs: Array[Array[Double]] =
      codebooks.map(_.toArray).toArray

    override def nullSafeEval(input: Any): Any =
      VectorKernels.pqEncode(input.asInstanceOf[ArrayData], cbs)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("pqCodebooks", cbs, "double[][]")
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("pqCode")
        s"""
           |byte[] $tmp = graft.functions.VectorKernels.pqEncode($c, $cRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp; }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def pqEncode(vec: Column, codebooks: Seq[Seq[Double]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))

  /** [[PqEncode]] with `array<int>` output — the Lloyd-iteration form,
    * where the per-subspace code feeds an `element_at` regroup. */
  case class PqAssign(child: Expression, codebooks: Seq[Seq[Double]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "pq_assign"

    @transient private lazy val cbs: Array[Array[Double]] =
      codebooks.map(_.toArray).toArray

    override def nullSafeEval(input: Any): Any = {
      val r = VectorKernels.pqAssignInts(input.asInstanceOf[ArrayData], cbs)
      if (r == null) null
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("pqCodebooks", cbs, "double[][]")
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("pqAssign")
        s"""
           |int[] $tmp = graft.functions.VectorKernels.pqAssignInts($c, $cRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp); }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def pqAssign(vec: Column, codebooks: Seq[Seq[Double]]): Column =
    ColumnBridge.column(PqAssign(ColumnBridge.expression(vec), codebooks))

  /** Per-query asymmetric-distance lookup table (`array<double>`, m×ks
    * entries): entry `j*ks+c` = dot(query subvector j, centroid c). Built
    * once per QUERY row, so the per-candidate work drops to the O(m)
    * gather in [[PqAdcDot]]. */
  case class PqLut(child: Expression, codebooks: Seq[Seq[Double]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "pq_lut"

    @transient private lazy val cbs: Array[Array[Double]] =
      codebooks.map(_.toArray).toArray

    override def nullSafeEval(input: Any): Any = {
      val r = VectorKernels.pqLut(input.asInstanceOf[ArrayData], cbs)
      if (r == null) null
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("pqCodebooks", cbs, "double[][]")
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("pqLut")
        s"""
           |double[] $tmp = graft.functions.VectorKernels.pqLut($c, $cRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp); }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def pqLut(vec: Column, codebooks: Seq[Seq[Double]]): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(vec), codebooks))

  /** `dot(query, reconstruction(code))` — the ADC scan kernel: an O(m)
    * table gather per (query LUT, corpus code) pair. */
  case class PqAdcDot(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_adc_dot"

    override def nullSafeEval(l: Any, r: Any): Any =
      VectorKernels.pqAdcDot(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val tmp = ctx.freshName("adc")
        s"""
           |java.lang.Double $tmp = graft.functions.VectorKernels.pqAdcDot($l, $r);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def pqAdcDot(lut: Column, code: Column): Column =
    ColumnBridge.column(PqAdcDot(ColumnBridge.expression(lut), ColumnBridge.expression(code)))

  /** ‖reconstruction(code)‖² from the per-centroid squared-norm table
    * (exact — subspaces partition the coordinates, so norms add). */
  case class PqReconNorm2(child: Expression, cn2: Seq[Double])
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_recon_norm2"

    @transient private lazy val cn2Arr: Array[Double] = cn2.toArray

    override def nullSafeEval(input: Any): Any =
      VectorKernels.pqReconNorm2(input.asInstanceOf[Array[Byte]], cn2Arr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val nRef = ctx.addReferenceObj("pqCn2", cn2Arr, "double[]")
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("rn2")
        s"""
           |java.lang.Double $tmp = graft.functions.VectorKernels.pqReconNorm2($c, $nRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def pqReconNorm2(code: Column, cn2: Seq[Double]): Column =
    ColumnBridge.column(PqReconNorm2(ColumnBridge.expression(code), cn2))

  /** `dot(recon(codeA), recon(codeB))` via the symmetric-distance table —
    * the CODE-PAIR scoring kernel: both operands are m-byte codes, so a
    * pair shuffle (e.g. semantic dedup's cluster join) never has to carry
    * float vectors to score its candidates. The m×ks×ks table lives in
    * the plan as a reference object (a few KB at the registered m=16,
    * ks=16), one O(m) gather per pair. */
  case class PqSdcDot(left: Expression, right: Expression, sdc: Seq[Double])
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_sdc_dot"

    @transient private lazy val sdcArr: Array[Double] = sdc.toArray

    override def nullSafeEval(l: Any, r: Any): Any =
      VectorKernels.pqSdcDot(l.asInstanceOf[Array[Byte]],
        r.asInstanceOf[Array[Byte]], sdcArr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tRef = ctx.addReferenceObj("pqSdc", sdcArr, "double[]")
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val tmp = ctx.freshName("sdc")
        s"""
           |java.lang.Double $tmp = graft.functions.VectorKernels.pqSdcDot($l, $r, $tRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def pqSdcDot(codeA: Column, codeB: Column, sdc: Seq[Double]): Column =
    ColumnBridge.column(PqSdcDot(ColumnBridge.expression(codeA),
      ColumnBridge.expression(codeB), sdc))
}
