package graft.plans

import graft.functions.EsMurmur3
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, Metadata, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Optimizer rule: routing-key point lookups on shard bundles prune to one
 * shard directory.
 *
 * A bundle is written partitioned by `_shard = es_shard(_routing, n)`
 * ([[graft.sink.BundleSink]]). Catalyst cannot know that `_routing = 'k'`
 * implies `_shard = es_shard('k', n)` — the hash lives outside the plan —
 * so a point lookup would scan every shard directory. [[BundleReader]] tags
 * the `_shard` attribute's metadata with the bundle's shard count; this rule
 * finds `_routing = <literal>` conjuncts under such relations and adds the
 * implied `_shard = <computed>` conjunct, which the builtin
 * PruneFileSourcePartitions rule then pushes into the file index: a 1-of-n
 * directory scan instead of a full one. The ES-side analog is routed search
 * (`?routing=k` hits one shard); SURVEY.md §4.1 "storage-aligned
 * partitioning".
 */
object BundleRoutingPruning extends Rule[LogicalPlan] {
  val NumShardsKey = "graft.numShards"

  private def split(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => split(l) ++ split(r)
    case other     => Seq(other)
  }

  /** numShards metadata on a `_shard` attribute/alias, if tagged. */
  private def shardsOf(ne: NamedExpression): Option[Long] = {
    val meta: Metadata = ne match {
      case a: Alias              => a.metadata
      case a: AttributeReference => a.metadata
      case _                     => Metadata.empty
    }
    if (ne.name == "_shard" && meta.contains(NumShardsKey))
      Some(meta.getLong(NumShardsKey))
    else None
  }

  private def rewriteFilter(f: Filter, shard: Attribute, n: Int): Filter = {
    val conjuncts = split(f.condition)
    val alreadyPruned = conjuncts.exists {
      case EqualTo(a: AttributeReference, Literal(_, IntegerType)) => a.semanticEquals(shard)
      case EqualTo(Literal(_, IntegerType), a: AttributeReference) => a.semanticEquals(shard)
      case _ => false
    }
    val routingLit = conjuncts.collectFirst {
      case EqualTo(a: AttributeReference, Literal(s: UTF8String, _: StringType))
        if a.name == "_routing" => s.toString
      case EqualTo(Literal(s: UTF8String, _: StringType), a: AttributeReference)
        if a.name == "_routing" => s.toString
    }
    routingLit match {
      case Some(r) if !alreadyPruned =>
        Filter(And(f.condition, EqualTo(shard,
          Literal(EsMurmur3.shard(r, n), IntegerType))), f.child)
      case _ => f
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // shape after pushdown: Project(_shard alias w/ metadata) over Filter
    case p @ Project(projList, f: Filter)
      if projList.exists(_.name == "_shard") => // cheap guard before any allocation
      val tagged = projList.collectFirst {
        case ne if shardsOf(ne).isDefined =>
          (shardsOf(ne).get,
            f.child.output.collectFirst { case a if a.name == "_shard" => a })
      }
      tagged match {
        case Some((n, Some(underlying))) =>
          p.copy(child = rewriteFilter(f, underlying, n.toInt))
        case _ => p
      }
    // shape before pushdown: Filter directly over the tagged output
    case f @ Filter(_, child) if child.output.exists(_.name == "_shard") =>
      child.output.collectFirst {
        case a: AttributeReference if shardsOf(a).isDefined => (a, shardsOf(a).get)
      } match {
        case Some((shard, n)) => rewriteFilter(f, shard, n.toInt)
        case None             => f
      }
  }
}

/** SparkSessionExtensions registration (for --conf spark.sql.extensions);
  * [[GraftExtensions.install]] covers already-running sessions. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => BundleRoutingPruning)
}

object GraftExtensions {
  /** Attach the rule to a live session via experimental methods. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(BundleRoutingPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BundleRoutingPruning
}
