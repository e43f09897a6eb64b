package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * allocates an intermediate 64-element array per pair and walks it twice;
  * on an O(N^2) similarity pass that allocation dominates. This expression
  * generates a single fused loop inside whole-stage codegen (doGenCode),
  * no allocation, same strictly sequential fold order — so results remain
  * bit-identical to the higher-order form and to DuckDB's list_reduce
  * mirror used by the oracles.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type annotation omitted: AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

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

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")

  /** (identifier, info, builder) triples — shared by [[register]] and
    * [[GraftExtensions]], see [[TextExpressions.registrations]]. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((FunctionIdentifier("graft_dot"), dotInfo,
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))

  /** Idempotently register graft_dot in a session's function registry so
    * `call_function`/SQL can use it regardless of how the session was
    * built (the driver contract builds sessions without extensions). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** SparkSessionExtensions entry point: injects the FULL native surface
  * at session build time — every text/vector kernel expression plus the
  * kernel-fusion optimizer rule
  * ([[graft.plans.CollapseDistinctPosShingles]]) — via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. The catalog
  * queries stay extension-independent (they call the idempotent
  * `register` helpers because the driver contract builds plain
  * sessions); the extension is the embedding story: a host application
  * that configures it once gets the whole kernel family and the fusion
  * rule in every session, including pure-SQL ones. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    (VectorExpressions.registrations ++ TextExpressions.registrations)
      .foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.CollapseDistinctPosShingles)
  }
}
