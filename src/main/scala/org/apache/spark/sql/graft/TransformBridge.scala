package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions._

/** DSv2 partition `Transform` → the engine's partition-spec grammar
  * (`identity(c)` / `year(c)` / `month(c)` / `day(c)` / `hour(c)` /
  * `bucket(16,c)` / `truncate(8,c)`). The concrete Transform case
  * classes are `private[sql]`, hence this bridge lives under
  * `org.apache.spark.sql`. Unsupported shapes refuse loudly at DDL
  * time — never a silently-dropped partition spec. */
object TransformBridge {

  def spec(t: Transform): String = {
    def ref(e: Expression): String = e match {
      case n: NamedReference =>
        require(n.fieldNames.length == 1,
          s"nested partition reference unsupported: ${n.describe}")
        n.fieldNames()(0)
      case other => throw new UnsupportedOperationException(
        s"unsupported partition reference: ${other.describe}")
    }
    t match {
      case IdentityTransform(r) => ref(r)
      case YearsTransform(r) => s"year(${ref(r)})"
      case MonthsTransform(r) => s"month(${ref(r)})"
      case DaysTransform(r) => s"day(${ref(r)})"
      case HoursTransform(r) => s"hour(${ref(r)})"
      case b: BucketTransform =>
        require(b.columns.size == 1,
          s"multi-column bucket transform unsupported: ${b.describe}")
        s"bucket(${b.numBuckets.value},${ref(b.columns.head)})"
      case a: ApplyTransform if a.name == "truncate" && a.args.length == 2 =>
        a.args.toSeq match {
          case Seq(l: Literal[_], r: NamedReference) =>
            s"truncate(${l.value},${ref(r)})"
          case Seq(r: NamedReference, l: Literal[_]) =>
            s"truncate(${l.value},${ref(r)})"
          case other => throw new UnsupportedOperationException(
            s"unsupported truncate arguments: $other")
        }
      case other => throw new UnsupportedOperationException(
        s"unsupported partition transform: ${other.describe} — supported: " +
          "identity, years, months, days, hours, bucket, truncate")
    }
  }
}
