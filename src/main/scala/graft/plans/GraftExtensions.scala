package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine extensions, installed via
  * `spark.sql.extensions=graft.plans.GraftExtensions`:
  *
  *  - `graft_cosine(a, b)`: the native codegen'd cosine expression,
  *    available to SQL and (via `call_function`) the DataFrame API.
  *  - [[SelfCosineRule]]: optimizer rule folding `graft_cosine(x, x)`
  *    to 1.0 (null-preserving) — a vector compared to itself needs no
  *    arithmetic; catches the reflexive pairs ANN pipelines generate.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine(a, b) takes 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ema"),
      new ExpressionInfo(classOf[EmaAggregate].getName, "graft_ema"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_ema(value, span) takes 2 arguments")
        EmaAggregate(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsAggregate].getName, "graft_cms"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_cms(key, depth, width) takes 3 arguments")
        CmsAggregate(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "graft_minhash_sigs"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_minhash_sigs(toks, k) takes 2 arguments")
        MinhashSigs(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash_sig"),
      new ExpressionInfo(classOf[SimhashSig].getName, "graft_simhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash_sig(toks) takes 1 argument")
        SimhashSig(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "graft_gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_gram_hashes(toks, k) takes 2 arguments")
        GramHashes(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_lsh_buckets(emb) takes 1 argument")
        LshBuckets(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "graft_char_entropy"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_char_entropy(text) takes 1 argument")
        CharEntropy(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_freq_items"),
      new ExpressionInfo(classOf[FreqItemsAggregate].getName, "graft_freq_items"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_freq_items(item, capacity) takes 2 arguments")
        FreqItemsAggregate(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sentiment"),
      new ExpressionInfo(classOf[SentimentCompound].getName, "graft_sentiment"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_sentiment(raw_toks) takes 1 argument")
        SentimentCompound(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_registered_domain"),
      new ExpressionInfo(classOf[RegisteredDomain].getName, "graft_registered_domain"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_registered_domain(host) takes 1 argument")
        RegisteredDomain(children.head)
      }))
    ext.injectOptimizerRule(_ => SelfCosineRule)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

/** cos(x, x) (deterministic child) — one accumulator instead of three.
  * Folding to a literal 1.0 would be wrong for degenerate vectors
  * (empty / zero-norm / NaN elements all yield NaN at runtime);
  * [[SelfCosine]] is bit-identical to the binary form on every input,
  * so the rule firing can never change results. */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        SelfCosine(a)
    }
}
