package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that FORCES a projection column to be evaluated once
  * per input row (r18). Whole-stage codegen defers a deterministic
  * Project expression to its first USE site — and for the STREAM side of
  * a broadcast join (BroadcastHashJoin probe side, BroadcastNestedLoopJoin
  * stream side) that site is inside the per-build-row loop, so an
  * "hoisted" per-row column silently re-evaluates once per PAIR. Measured
  * with thread-dump sampling at sf1: q_ann_pq's ADC scan spent most of
  * its 25 executor-seconds inside PqMath.encode — the per-corpus-row
  * encoding (M·K·dsub multiplies) re-run 400× per row by the deferral.
  * (Shuffle-join inputs are immune: the exchange serializes full rows, so
  * everything below it is forced.)
  *
  * The forcing mechanism is the guide §4.4 pattern: a non-deterministic
  * expression may not be deferred, duplicated, or reordered, so ProjectExec
  * evaluates it eagerly at the project's position — exactly once per row.
  * The wrapper is value-wise a NO-OP (same eval, same codegen, same nulls);
  * "non-deterministic" here is a scheduling annotation, not a semantic one.
  * Costs of the annotation: filters don't push through the wrapping
  * project and CollapseProject won't merge it — both irrelevant-to-desired
  * at the wrapped sites (scan-adjacent projections feeding a join).
  * Do NOT wrap columns feeding a self-join's shared exchange: sameResult()
  * comparisons fail for non-deterministic twins and the exchange reuse is
  * lost (none of the wrapped sites are self-joins).
  */
case class EvalOnceF(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): EvalOnceF =
    copy(child = newChild)
  override def prettyName: String = "eval_once"
}
