package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY.md §2 preference ladder step (b):
  * a custom `Expression` with `doGenCode` beats a Scala UDF). These stay
  * inside whole-stage codegen — no serialization boundary, unlike the UDF
  * or mapPartitions routes — so they compose with Column-only pipelines.
  */

/** Winnowing fingerprints (Schleimer et al. 2003) as a codegen'd unary
  * expression: string → array<long>. Delegates the inner loop to the same
  * static [[graft.text.TextAnalysis.winnow]] the typed path uses, so both
  * surfaces stay semantics-identical.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(
      graft.text.TextAnalysis.winnow(input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.text.TextAnalysis.winnow($c.toString(), $k, $w));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** FNV-1a 64-bit hash as a codegen'd expression: string → long. Same
  * static implementation as the dedup shingler ([[graft.dedup.Dedup.fnv1a64]]).
  */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fnv64"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def nullSafeEval(input: Any): Any =
    graft.dedup.Dedup.fnv1a64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.Dedup.fnv1a64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

/** Unicode NFC normalization as a codegen'd expression: string → string.
  * The canonical pre-dedup text normalization (composed forms make
  * byte-level dedup/hashing see "é" and "e"+combining-acute as the same
  * document). Fast path: `Normalizer.isNormalized` is a cheap scan and
  * virtually all real text IS already NFC, so the common case allocates
  * nothing and returns the input UTF8String as-is.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object expressions {

  /** Column-level entry points (usable without SQL registration). */
  import org.apache.spark.sql.graftbridge.Bridge

  def winnow_fp(c: Column, k: Int = 8, w: Int = 4): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c), k, w))

  def fnv64(c: Column): Column =
    Bridge.column(Fnv64(Bridge.expression(c)))

  def nfc_normalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** SQL registration for an existing session (temp functions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_winnow",
      es => WinnowFingerprints(es.head,
        es.lift(1).map(_.eval().toString.toInt).getOrElse(8),
        es.lift(2).map(_.eval().toString.toInt).getOrElse(4)), "built-in")
    reg.createOrReplaceTempFunction("graft_fnv64",
      es => Fnv64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_nfc",
      es => NfcNormalize(es.head), "built-in")
  }
}

/** SparkSessionExtensions entry point (SURVEY.md §2 ladder step (c) wiring):
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions` exposes the
  * functions to pure-SQL users at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (es: Seq[Expression]) => WinnowFingerprints(es.head,
        es.lift(1).map(_.eval().toString.toInt).getOrElse(8),
        es.lift(2).map(_.eval().toString.toInt).getOrElse(4))))
    e.injectFunction((
      new FunctionIdentifier("graft_fnv64"),
      new ExpressionInfo(classOf[Fnv64].getName, "graft_fnv64"),
      (es: Seq[Expression]) => Fnv64(es.head)))
    e.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
  }
}
