package graft.plans

import graft.functions.Dna
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hottest domain scalars — the
  * preference ladder from SURVEY.md §7.3: built-in composition first,
  * then a custom `Expression` with codegen (this file), then UDFs.
  *
  * `RevCompExpression` generates straight-line Java (no row boxing, no
  * Scala closure dispatch) and stays inside whole-stage codegen;
  * `KmerGenerator` is a true Catalyst Generator: it streams k-mers to
  * the consumer without materializing the full substring array the
  * `transform(sequence(...))` formulation builds per row.
  */
object NativeDna {

  /** Codegen-ed revcomp core, shared by interpreted + generated paths.
    * Public + static-shaped so generated code can call it.
    */
  def revcomp(s: UTF8String): UTF8String =
    UTF8String.fromString(Dna.reverseComplement(s.toString))

  /** Codegen-ed codon translation core (X2). */
  def translateDna(s: UTF8String): UTF8String =
    UTF8String.fromString(Dna.translateDna(s.toString))

  /** Unicode NFC normalization core — composes decomposed sequences
    * (e + U+0301 → é) so visually-identical text hashes identically:
    * the standard preprocessing step before exact/near dedup on
    * multilingual corpora. ASCII fast path: bytes==chars means no
    * combining sequences, return the input untouched (no String
    * round-trip on the common case).
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.getBytes.length == s.numChars()) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }
}

/** X1 as a native unary expression with whole-stage codegen support. */
case class RevCompExpression(child: Expression) extends UnaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"revcomp_native requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "revcomp_native"

  override protected def nullSafeEval(v: Any): Any =
    NativeDna.revcomp(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeDna.revcomp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** X2 as a native unary expression: the 64-entry codon table compiled
  * into JIT-ed Scala, invoked from whole-stage-generated code — replaces
  * the per-row Scala UDF (closure dispatch + row boxing) in q24.
  */
case class TranslateDnaExpression(child: Expression) extends UnaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"translate_dna_native requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "translate_dna_native"

  override protected def nullSafeEval(v: Any): Any =
    NativeDna.translateDna(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeDna.translateDna($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native unary expression (whole-stage
  * codegen): text-pipeline preprocessing so canonically-equivalent
  * strings fingerprint identically before dedup.
  */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_native requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_native"

  override protected def nullSafeEval(v: Any): Any =
    NativeDna.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeDna.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** X5 as a Catalyst Generator: one output row per k-mer, streamed —
  * the `explode(transform(sequence(...)))` formulation materializes an
  * O(len·k) array per row first; this emits substrings lazily.
  */
case class KmerGenerator(child: Expression, kExpr: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def elementSchema: StructType =
    StructType(StructField("kmer", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input)
    val kv = kExpr.eval(input)
    if (s == null || kv == null) Iterator.empty
    else {
      val u = s.asInstanceOf[UTF8String]
      val k = kv.asInstanceOf[Int]
      val bytes = u.getBytes
      if (k <= 0) Iterator.empty
      else if (bytes.length == u.numChars()) {
        // ASCII fast path: fromBytes wraps the shared array with an
        // offset — one allocation per k-mer, no re-encode, no String.
        if (bytes.length < k) Iterator.empty
        else (0 to bytes.length - k).iterator.map { i =>
          InternalRow(UTF8String.fromBytes(bytes, i, k))
        }
      } else {
        val str = u.toString
        if (str.length < k) Iterator.empty
        else (0 to str.length - k).iterator.map { i =>
          InternalRow(UTF8String.fromString(str.substring(i, i + k)))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** JIT-compiled vector kernel shared by the interpreted and generated
  * paths of [[DotProductExpression]].
  */
object NativeVec {
  /** Index-ordered double dot product — bit-identical to the
    * `aggregate(zip_with(x, y, (p, q) => p*q), 0.0, _+_)` HOF
    * formulation (same cast-then-multiply-then-add sequence, same
    * order), including its null semantics: unequal lengths or a null
    * element yield null.
    */
  def dot(l: org.apache.spark.sql.catalyst.util.ArrayData,
          r: org.apache.spark.sql.catalyst.util.ArrayData,
          lFloat: Boolean, rFloat: Boolean): java.lang.Double = {
    val n = l.numElements()
    if (n != r.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return null
      val x = if (lFloat) l.getFloat(i).toDouble else l.getDouble(i)
      val y = if (rFloat) r.getFloat(i).toDouble else r.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Native dot product over two array<float|double> columns.
  *
  * The `aggregate(zip_with(...))` HOF formulation is CodegenFallback —
  * every element dispatches through interpreted lambda closures, the
  * same trap that cost q21/q28 4-5× on k-mers. This expression compiles
  * to one JIT-ed while-loop and stays inside whole-stage codegen — the
  * hot kernel of every cosine operator (brute-force, ANN, IVF, k-means,
  * embedding near-dup).
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_native requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_native"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    NativeVec.dot(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.plans.NativeVec.dot(
         |  $l, $r, ${isFloat(left)}, ${isFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration: both an extensions class (for
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) and a
  * runtime registry hook for already-built sessions.
  */
object NativeFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "revcomp_native" -> (exprs => RevCompExpression(exprs.head)),
    "translate_dna_native" -> (exprs => TranslateDnaExpression(exprs.head)),
    "kmers_native" -> (exprs => KmerGenerator(exprs(0), exprs(1))),
    "dot_native" -> (exprs => DotProductExpression(exprs(0), exprs(1))),
    "nfc_native" -> (exprs => NfcNormalizeExpression(exprs.head)))

  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("revcomp_native"),
      new ExpressionInfo(classOf[RevCompExpression].getName, "revcomp_native"),
      (exprs: Seq[Expression]) => RevCompExpression(exprs.head)))
    e.injectFunction((FunctionIdentifier("translate_dna_native"),
      new ExpressionInfo(classOf[TranslateDnaExpression].getName, "translate_dna_native"),
      (exprs: Seq[Expression]) => TranslateDnaExpression(exprs.head)))
    e.injectFunction((FunctionIdentifier("kmers_native"),
      new ExpressionInfo(classOf[KmerGenerator].getName, "kmers_native"),
      (exprs: Seq[Expression]) => KmerGenerator(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("dot_native"),
      new ExpressionInfo(classOf[DotProductExpression].getName, "dot_native"),
      (exprs: Seq[Expression]) => DotProductExpression(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("nfc_native"),
      new ExpressionInfo(classOf[NfcNormalizeExpression].getName, "nfc_native"),
      (exprs: Seq[Expression]) => NfcNormalizeExpression(exprs.head)))
  }
}
