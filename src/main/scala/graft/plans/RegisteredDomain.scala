package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_registered_domain(host)` — the PSL registered-domain lookup
  * as ONE native expression node.
  *
  * The declarative twin ([[graft.functions.Urls.registeredDomainDeclarative]])
  * compiles the full publicsuffix.org snapshot into a when-chain whose
  * tiers hold ~9k string literals each. Per-row that is O(1) (each
  * tier folds to an InSet hash probe), but per-QUERY it is not: every
  * plan that calls it re-builds, re-analyzes, constant-folds and
  * codegens a multi-thousand-literal expression tree — measured as
  * q_domain_health's 1.85→2.96 s regression when the bundled PSL grew
  * from 551 to 14,248 lines (r15). This node replaces the literal
  * tree with one call into a JVM lookup over rule sets hashed ONCE
  * per JVM ([[RegisteredDomainLookup]]) — plan size is constant in
  * the rule count, and the per-row work drops to a port strip, a
  * label split and ≤ a dozen hash-set probes.
  *
  * Semantics are bit-identical to the twin (FunctionsSpec pins
  * equality over every structural rule shape AND a generated corpus):
  * both consume the SAME parsed [[graft.functions.Urls.SuffixRules]],
  * strip one trailing `:<digits>` port, split on dots with trailing
  * empties kept, test exceptions longest-first then suffix tiers
  * longest-first, and degrade hosts at-or-below their public suffix
  * to themselves. The DuckDB oracle replay
  * ([[graft.functions.Urls.registeredDomainSql]]) is generated from
  * the same rule sets and is unaffected.
  */
object RegisteredDomainLookup {

  private val rules = graft.functions.Urls.SuffixRules

  /** Rule sets as JVM hash sets indexed by label count (null = no
    * rules at that tier) — built once per JVM, shared by eval and
    * generated code. */
  private def byK(m: Map[Int, Seq[String]], size: Int): Array[java.util.HashSet[String]] = {
    val a = new Array[java.util.HashSet[String]](size)
    m.foreach { case (k, v) =>
      val s = new java.util.HashSet[String](v.size * 2)
      v.foreach(s.add)
      a(k) = s
    }
    a
  }
  private val maxSuffix = rules.maxSuffix
  private val exactByK = byK(rules.exact, maxSuffix + 2)
  private val wildByK = byK(rules.wildParent, maxSuffix + 2)
  // exceptions checked longest-first, like the twin's when-chain order
  private val excTiers: Array[Int] = rules.exc.keys.toArray.sorted.reverse
  private val excByK = byK(rules.exc, excTiers.headOption.map(_ + 2).getOrElse(2))

  def domain(host: UTF8String): UTF8String =
    UTF8String.fromString(domainOf(host.toString))

  /** The shared lookup on a JVM string; package-visible for the spec's
    * direct fixtures. */
  private[graft] def domainOf(hostPort: String): String = {
    // one trailing-port strip, same semantics as the twin's ":\d+$"
    val ci = hostPort.lastIndexOf(':')
    val h = if (ci >= 0 && ci < hostPort.length - 1 && {
        var j = ci + 1
        var digits = true
        while (j < hostPort.length && digits) {
          val c = hostPort.charAt(j)
          if (c < '0' || c > '9') digits = false
          j += 1
        }
        digits
      }) hostPort.substring(0, ci)
      else hostPort
    // trailing empties kept — Spark's split(h, "\\.") semantics
    val labels = h.split("\\.", -1)
    val n = labels.length
    def lastK(k: Int): String = {
      val from = math.max(0, n - k)
      val sb = new java.lang.StringBuilder
      var i = from
      while (i < n) {
        if (i > from) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
    var e = 0
    while (e < excTiers.length) {
      val k = excTiers(e)
      if (n >= k && excByK(k).contains(lastK(k))) return lastK(k)
      e += 1
    }
    var k = maxSuffix
    while (k >= 2) {
      if (n >= k) {
        val ex = exactByK(k)
        val wp = if (k - 1 < wildByK.length) wildByK(k - 1) else null
        if ((ex != null && ex.contains(lastK(k))) ||
            (wp != null && wp.contains(lastK(k - 1))))
          return if (n >= k + 1) lastK(k + 1) else h
      }
      k -= 1
    }
    if (n >= 2) lastK(2) else h
  }
}

case class RegisteredDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_registered_domain requires STRING, got ${other.simpleString}")
  }
  override def nullSafeEval(host: Any): Any =
    RegisteredDomainLookup.domain(host.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.plans.RegisteredDomainLookup.domain($h);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_registered_domain"
}
