package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality audit (the deequ shape): each rule names an
 * OBSERVED metric (an aggregate expression) and a pass predicate over it;
 * the audit returns one row per rule — the contract report an ingest job
 * gates on.
 *
 * Scale shape: ALL observed metrics compute in ONE aggregation pass over
 * the table (a rule list never multiplies scans), and the per-rule rows
 * are exploded from that single 1-row result — output is rule-count-sized
 * regardless of table size. Rules whose metrics are decimal/integer-
 * derived compare exactly across engines; float metrics follow the 6-dp
 * rounding policy.
 */
object DataQuality {

  /** A named check: `observed` is an aggregate Column producing a DOUBLE
    * metric; `pass` maps the observed value to a boolean Column. */
  final case class AuditRule(name: String, observed: Column,
                             pass: Column => Column)

  /** One row per rule: (rule, observed, pass ∈ {0,1}). */
  def audit(df: DataFrame, rules: Seq[AuditRule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      r.observed.cast("double").as(s"_o$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"_o$i").as("observed"),
        r.pass(col(s"_o$i")).cast("long").as("pass"))
    }
    one.select(inline(array(rows: _*)))
  }
}
