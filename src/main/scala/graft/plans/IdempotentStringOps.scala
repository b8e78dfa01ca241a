package graft.plans

import org.apache.spark.sql.catalyst.expressions.StringTrim
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer extension: collapse provably idempotent string operations
  * Catalyst's own simplifier misses.
  *
  * Catalyst ships `SimplifyCaseConversionExpressions` for the
  * case-conversion family (`lower(lower(e))`, `lower(upper(e))` …),
  * but has no equivalent for trimming: `trim(trim(e))` re-scans every
  * row's string for whitespace that the inner call already removed.
  * The nesting arises naturally when operators compose — every graft
  * text operator normalizes its input DEFENSIVELY (it cannot know
  * whether the caller already did), so a curation chain that feeds one
  * operator's trimmed output into the next stacks redundant trim work
  * on 100 TB of text. This rule deletes the redundant layer at plan
  * time instead of asking operators to trust their callers.
  *
  * Registered through BOTH extension paths (the `spark.sql.extensions`
  * hook via [[graft.core.GraftExtensions]]' `injectOptimizerRule`, and
  * `experimental.extraOptimizations` for already-built sessions) — the
  * optimizer-rule analog of the native expression registrations. Scope
  * is deliberately narrow: only direct self-nesting idempotent for
  * EVERY input. Plain whitespace trim qualifies; a custom trim-string
  * pair is idempotent only when both levels share the set, and
  * same-pattern regexp_replace is not idempotent in general — both
  * left alone. */
object IdempotentStringOps extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case StringTrim(inner @ StringTrim(_, None), None) => inner
    }
}
