package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train-side counterpart of [[TextOps.hashedLinearMargin]]: fit a
  * logistic regression over hashed bag-of-words counts and hand the
  * learned weights straight back to the scan-stage scorer. The feature
  * map is THE SAME portable PolyHash slot assignment the scorer uses, so
  * the deployed margin `bias + Σ w(h(tok))` equals the model's raw
  * prediction `intercept + Σ coef_j·count_j` exactly — training happens
  * once on a labeled sample (driver-coordinated LBFGS over a cached
  * frame), deployment is a literal array inside a codegen'd fold with no
  * model object, no broadcast, no serving service. That closed loop —
  * fit on a 0.1% sample, score 100 TB in the scan — is the production
  * shape of every corpus quality filter. */
object Classifier {

  /** Hashed slot-count feature array (length `dim`): slot j holds the
    * number of tokens hashing to j — ONE native pass per row
    * ([[graft.functions.SlotCounts]]); the HOF spelling below hashed
    * every token dim times through interpreted lambdas (dim×ntok
    * interpreted evals per row dominated both training-feature
    * materialization and the t17 deploy-consistency check). */
  private[graft] def slotCounts(text: Column, dim: Int): Column =
    graft.functions.HashFunctions.slotCounts(TextOps.tokens(text), dim)

  /** The higher-order-function formulation slotCounts replaced; private
    * to the bit-equality spec (the wordShinglesHof discipline). */
  private[graft] def slotCountsHof(text: Column, dim: Int): Column = {
    val toks = TextOps.tokens(text)
    transform(sequence(lit(0), lit(dim - 1)), j =>
      size(filter(toks, t =>
        graft.functions.HashFunctions.polyHash(t, 257, 2147483647L) % dim === j))
        .cast("double"))
  }

  /** Learned model: weights + bias, in the exact shape
    * [[TextOps.hashedLinearMargin]] consumes. */
  final case class HashedLinearModel(weights: Seq[Double], bias: Double) {
    def margin(text: Column): Column =
      TextOps.hashedLinearMargin(text, weights, bias)
    def probability(text: Column): Column = TextOps.sigmoid(margin(text))
  }

  /** Fit a binomial logistic regression on (text, label∈{0,1}) rows.
    * Deterministic: the feature map is hash-derived (no vocabulary
    * fitting), LBFGS over a fixed frame has no sampling, and the
    * standardization is disabled so the coefficients ARE the deployable
    * per-slot weights (standardized coefficients would bake per-slot
    * scale factors into the model that the scan-side fold cannot see). */
  def fitQualityClassifier(df: DataFrame, text: Column, label: Column,
      dim: Int = 64, maxIter: Int = 50, regParam: Double = 1e-4): HashedLinearModel = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val train = df.select(array_to_vector(slotCounts(text, dim)).as("features"),
      label.cast("double").as("label")).cache()
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(false).setFitIntercept(true)
      .fit(train)
    train.unpersist()
    HashedLinearModel(model.coefficients.toArray.toSeq, model.intercept)
  }
}
