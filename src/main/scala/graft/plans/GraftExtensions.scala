package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Builder-time registration of graft's Catalyst extensions, for
  * sessions graft constructs itself (or via
  * `spark.sql.extensions=graft.plans.GraftExtensions`):
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).…
  * }}}
  *
  * For sessions owned by a caller (the verification driver), the
  * equivalent runtime path is [[AsOfNative.ensureRegistered]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfNative.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => RangeJoinNative.RangeJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfKeyPushdown)
  }
}
